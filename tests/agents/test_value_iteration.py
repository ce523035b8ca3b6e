"""Value Iteration parity tests: exact Q-table match vs the reference
implementation (BASELINE.md config 1)."""
import sys

import numpy as np
import pytest

from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.agents.dynamic_programming.value_iteration import ValueIterationAgent
from rl_agents_tpu.agents.dynamic_programming.robust_value_iteration import RobustValueIterationAgent

LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}


def reference_vi_agent(env_config, agent_config):
    """Instantiate the reference's (pure numpy) VI agent on a duck-typed MDP."""
    sys.path.insert(0, "/root/reference")
    from rl_agents.agents.dynamic_programming.value_iteration import (
        ValueIterationAgent as RefVI,
    )

    class FakeMDP:
        mode = env_config["mode"]
        transition = np.asarray(env_config["transition"])
        reward = np.asarray(env_config["reward"], dtype=float)
        terminal = np.asarray(env_config["terminal"], dtype=bool)

    class FakeEnv:
        mdp = FakeMDP()
        unwrapped = None

    agent = RefVI.__new__(RefVI)
    from rl_agents.configuration import Configurable

    Configurable.__init__(agent, agent_config)
    agent.finite_mdp = True
    agent.mdp = FakeMDP()
    agent.env = FakeEnv()
    agent.state_action_value = agent.get_state_action_value()
    return agent


@pytest.mark.parametrize("gamma", [0.9, 0.8])
def test_vi_q_table_parity(gamma):
    env = make_mdp(LOOP_CONFIG)
    agent = ValueIterationAgent(env, {"gamma": gamma, "iterations": 200})
    ref = reference_vi_agent(LOOP_CONFIG, {"gamma": gamma, "iterations": 200})
    np.testing.assert_allclose(agent.state_action_value, ref.state_action_value,
                               rtol=1e-5, atol=1e-5)
    # same greedy policy everywhere
    for s in range(4):
        assert agent.act(s) == int(np.argmax(ref.state_action_value[s]))


def test_vi_terminal_states():
    config = dict(LOOP_CONFIG, terminal=[0, 0, 0, 1])
    env = make_mdp(config)
    agent = ValueIterationAgent(env, {"gamma": 0.9, "iterations": 200})
    ref = reference_vi_agent(config, {"gamma": 0.9, "iterations": 200})
    np.testing.assert_allclose(agent.state_action_value, ref.state_action_value,
                               rtol=1e-5, atol=1e-5)


def test_vi_stochastic_mode():
    rng = np.random.default_rng(0)
    S, A = 6, 3
    T = rng.random((S, A, S))
    T /= T.sum(-1, keepdims=True)
    config = {
        "mode": "stochastic",
        "transition": T.tolist(),
        "reward": rng.random((S, A)).tolist(),
        "terminal": [0, 0, 0, 0, 0, 1],
    }
    env = make_mdp(config)
    agent = ValueIterationAgent(env, {"gamma": 0.95, "iterations": 300})
    ref = reference_vi_agent(config, {"gamma": 0.95, "iterations": 300})
    np.testing.assert_allclose(agent.state_action_value, ref.state_action_value,
                               rtol=1e-4, atol=1e-4)


def test_vi_plan_trajectory():
    env = make_mdp(LOOP_CONFIG)
    agent = ValueIterationAgent(env, {"gamma": 0.9, "iterations": 200})
    states, actions = agent.plan_trajectory(0, horizon=5)
    assert len(states) == 5
    assert all(0 <= s < 4 for s in states)


def test_robust_vi_worst_case():
    # two models: second has degraded rewards on action 1; robust Q must lower-bound both
    m1 = dict(LOOP_CONFIG)
    m2 = dict(LOOP_CONFIG, reward=[[0, 0, 0.9], [0, 0, 0.9], [0, 0, 0], [0, 0, 0.9]])
    env = make_mdp(LOOP_CONFIG)
    robust = RobustValueIterationAgent(env, {"gamma": 0.9, "iterations": 200,
                                             "models": [m1, m2]})
    vi1 = ValueIterationAgent(make_mdp(m1), {"gamma": 0.9, "iterations": 200})
    vi2 = ValueIterationAgent(make_mdp(m2), {"gamma": 0.9, "iterations": 200})
    q_r = robust.state_action_value
    assert np.all(q_r <= vi1.state_action_value + 1e-4)
    assert np.all(q_r <= vi2.state_action_value + 1e-4)
    assert robust.act(0) in range(3)


def test_robust_vi_requires_models():
    env = make_mdp(LOOP_CONFIG)
    with pytest.raises(ValueError):
        RobustValueIterationAgent(env, {"gamma": 0.9})
