"""MCTS behavioral tests (mirrors reference tests/agents/tree_search/test_mcts.py:6-20:
the planner must survive a full CartPole episode)."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.mcts import MCTSAgent, mcts_plan_batch
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.envs.finite_mdp import make as make_mdp


def test_cartpole():
    env = make_cartpole({"max_episode_steps": 200})
    agent = MCTSAgent(env, config=dict(budget=400, temperature=200, gamma=0.95))
    agent.seed(1)

    state, info = env.reset(seed=1)
    done = truncated = False
    steps = 0
    while not done and not truncated:
        action = agent.act(state)
        assert action is not None
        state, reward, done, truncated, info = env.step(action)
        steps += 1
    assert steps == env.functional.max_episode_steps


def test_mcts_prefers_rewarding_action():
    env = make_mdp({
        "mode": "deterministic",
        "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]],
        "terminal": [0, 0],
        "max_episode_steps": 100,
    })
    env.reset(seed=0)
    agent = MCTSAgent(env, config=dict(budget=100, gamma=0.8))
    agent.seed(0)
    assert agent.act(0) == 1


def test_mcts_batch():
    env = make_cartpole({"max_episode_steps": 100})
    env.reset(seed=0)
    B = 8
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), env.state)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    probs = jnp.ones(2) / 2
    actions, lengths, trees = mcts_plan_batch(
        env.functional, env.params, states0, keys, probs, probs,
        num_actions=2, episodes=20, horizon=8, gamma=0.9, temperature=10.0)
    assert actions.shape == (B, 8)
    assert np.all(np.asarray(lengths) >= 1)
    # root visit counts equal the episode count
    np.testing.assert_array_equal(np.asarray(trees.count[:, 0]), 20)


def test_closed_loop_mcts():
    """closed_loop=True conditions on outcomes (reference mcts.py:147,267-273)."""
    from rl_agents_tpu.envs.gridenv import make_line

    env = make_line({})
    env.reset(seed=0)
    agent = MCTSAgent(env, config=dict(budget=120, gamma=0.9, closed_loop=True,
                                       max_next_states_count=4))
    agent.seed(0)
    total, done, trunc = 0.0, False, False
    obs = 0
    while not (done or trunc):
        a = agent.act(obs)
        obs, r, done, trunc, _ = env.step(a)
        total += r
    assert total >= 8  # near-max return on the stochastic line env
