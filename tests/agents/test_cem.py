import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.cem import CEMAgent, LatentCEMAgent
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.envs.dynamics import make as make_dynamics


def test_cem_cartpole_balances():
    """BASELINE.md config 3: CEM on CartPole with batched candidate sampling.
    A good plan keeps the pole up for the whole horizon."""
    env = make_cartpole({"max_episode_steps": 50})
    agent = CEMAgent(env, {"horizon": 12, "iterations": 5, "candidates": 80,
                           "top_candidates": 8, "gamma": 1.0})
    agent.seed(0)
    state, _ = env.reset(seed=0)
    total = 0.0
    for _ in range(30):
        action = agent.act(state)
        state, reward, done, truncated, _ = env.step(action)
        total += reward
        if done or truncated:
            break
    assert total >= 25  # random policy survives ~15 steps; CEM must do better


def test_cem_dynamics_regulates():
    env = make_dynamics({})
    agent = CEMAgent(env, {"horizon": 10, "iterations": 4, "candidates": 50,
                           "top_candidates": 5})
    agent.seed(0)
    env.reset(seed=0)
    plan = agent.plan(None)
    assert len(plan) == 10


def test_latent_cem():
    env = make_dynamics({})

    def transition_model(state, action, belief):
        return belief, state + 0.1 * action  # drift towards the action

    def reward_model(belief, state):
        return -jnp.sum(state**2, axis=-1)  # regulate to zero

    agent = LatentCEMAgent(env, {"horizon": 5, "iterations": 3, "candidates": 40,
                                 "top_candidates": 4},
                           transition_model=transition_model, reward_model=reward_model)
    agent.seed(0)
    action = agent.plan(np.zeros(2), np.ones(2))
    assert len(action) == 1
    assert action[0] < 0  # push the positive state towards zero


def test_cem_continuous_actions():
    """CEM over a Box action space (the reference's native setting)."""
    env = make_dynamics({"continuous": True})
    agent = CEMAgent(env, {"horizon": 10, "iterations": 5, "candidates": 60,
                           "top_candidates": 6})
    assert not agent.discrete
    agent.seed(0)
    env.reset(seed=0)
    plan = agent.plan(None)
    assert len(plan) == 10
    # regulating x0 from -1 toward 0 needs initial positive control
    assert plan[0][0] > 0
