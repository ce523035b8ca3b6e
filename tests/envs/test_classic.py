import numpy as np

from rl_agents_tpu.agents.tree_search.olop import OLOPAgent
from rl_agents_tpu.factory import load_environment


def test_mountaincar_matches_gymnasium():
    import gymnasium as gym

    genv = gym.make("MountainCar-v0").unwrapped
    genv.reset(seed=0)
    env = load_environment({"id": "mountaincar"})
    env.reset(seed=0)
    # force same initial state
    genv.state = np.array([float(env.state.position), float(env.state.velocity)])
    state = env.state
    for i in range(30):
        a = i % 3
        out = env.functional.step(env.params, state, a, env.key)
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        np.testing.assert_allclose(np.asarray(out.obs), gobs, rtol=1e-5, atol=1e-6)
        assert float(out.reward) == grew
        state = out.state


def test_pendulum_planner():
    env = load_environment({"id": "pendulum", "max_episode_steps": 30})
    env.reset(seed=0)
    agent = OLOPAgent(env, {"budget": 60, "gamma": 0.9})
    agent.seed(0)
    assert agent.act(env.obs) in range(5)


def test_linear_system_registry():
    env = load_environment({"id": "linear-system"})
    obs, _ = env.reset(seed=0)
    assert "state" in obs and "interval_min" in obs
