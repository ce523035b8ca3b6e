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


def test_mcts_step_by_prior_conversion():
    """Re-root + visit-count->prior conversion parity with the reference
    recursion (mcts.py:186-200 step_by_prior, mcts.py:288-301
    convert_visits_to_prior_in_branch), hand-computed on a small tree:
    prior(child) = 0.5*(count+1)/sum(count+1) + 0.5/|children|, counts reset,
    values kept."""
    from rl_agents_tpu.agents.tree_search.mcts import MCTSTree, mcts_step_by_prior

    # root(0) -> {1, 2}; 1 -> {3, 4}; counts [10, 6, 3, 2, 1]
    N, A = 8, 2
    tree = MCTSTree(
        parent=jnp.array([-1, 0, 0, 1, 1, -1, -1, -1], jnp.int32),
        children=jnp.array([[1, 2], [3, 4], [-1, -1], [-1, -1], [-1, -1],
                            [-1, -1], [-1, -1], [-1, -1]], jnp.int32),
        count=jnp.array([10, 6, 3, 2, 1, 0, 0, 0], jnp.int32),
        value=jnp.array([0.5, 0.6, 0.4, 0.7, 0.2, 0, 0, 0], jnp.float32),
        prior=jnp.full((N,), 0.125, jnp.float32),
        used=jnp.asarray(5, jnp.int32),
    )
    new_tree, valid = mcts_step_by_prior(tree, 0, num_actions=A, out_capacity=6)
    assert bool(valid)
    assert int(new_tree.used) == 3
    np.testing.assert_array_equal(np.asarray(new_tree.parent[:3]), [-1, 0, 0])
    np.testing.assert_array_equal(np.asarray(new_tree.children[0]), [1, 2])
    np.testing.assert_array_equal(np.asarray(new_tree.count[:3]), 0)
    # values kept (old nodes 1, 3, 4)
    np.testing.assert_allclose(np.asarray(new_tree.value[:3]), [0.6, 0.7, 0.2])
    # priors: total = (2+1) + (1+1) = 5 over the sibling block of {3, 4}
    np.testing.assert_allclose(float(new_tree.prior[1]), 0.5 * 3 / 5 + 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(new_tree.prior[2]), 0.5 * 2 / 5 + 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(new_tree.prior[0]), 0.125, rtol=1e-6)  # root keeps


def test_mcts_prior_strategy_agent_e2e():
    """MCTSAgent with step_strategy='prior' carries the re-rooted arena between
    env steps and still solves CartPole-style control (behavioral bar, matching
    the reference's MCTS test strategy)."""
    from rl_agents_tpu.envs.cartpole import make as make_cartpole

    env = make_cartpole({"max_episode_steps": 60})
    env.reset(seed=0)
    agent = MCTSAgent(env, config=dict(budget=150, gamma=0.95,
                                       step_strategy="prior"))
    agent.seed(0)
    obs, _ = env.reset(seed=0)
    steps, done, trunc = 0, False, False
    while not (done or trunc):
        a = agent.act(obs)
        obs, r, done, trunc, _ = env.step(a)
        steps += 1
    assert agent.carried_tree is not None
    assert steps == 60  # survives the full episode
    agent.reset()
    assert agent.carried_tree is None
