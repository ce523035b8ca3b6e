import jax
import numpy as np
import pytest

from rl_agents_tpu.agents.tree_search.olop import OLOPAgent, parse_threshold
from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.envs.gridenv import make_line


def test_parse_threshold():
    assert parse_threshold("4*np.log(time)") == 4.0
    assert parse_threshold("1.5 * np.log(time)") == 1.5
    assert parse_threshold(2.0) == 2.0
    with pytest.raises(ValueError):
        parse_threshold("__import__('os')")


def test_kl_olop_prefers_rewarding_action():
    env = make_mdp({
        "mode": "deterministic",
        "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]],
        "terminal": [0, 0],
        "max_episode_steps": 100,
    })
    env.reset(seed=0)
    agent = OLOPAgent(env, config={"budget": 100, "gamma": 0.8})
    agent.seed(0)
    assert agent.act(0) == 1


def test_olop_on_stochastic_env():
    env = make_line({})
    env.reset(seed=0)
    agent = OLOPAgent(env, config={"budget": 80, "gamma": 0.9,
                                   "continuation_type": "uniform"})
    agent.seed(0)
    action = agent.act(0)
    assert action in (0, 1)
    tree = agent.last_plan_data
    assert int(tree.count[0]) == 0  # root reward stats unused
    assert np.isfinite(float(tree.value_upper[0]))


def test_olop_hoeffding_variant():
    env = make_mdp({
        "mode": "deterministic",
        "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]],
        "terminal": [0, 0],
        "max_episode_steps": 100,
    })
    env.reset(seed=0)
    agent = OLOPAgent(env, config={
        "budget": 60, "gamma": 0.8,
        "upper_bound": {"type": "hoeffding", "time": "local", "threshold": 2.0}})
    agent.seed(0)
    assert agent.act(0) == 1
