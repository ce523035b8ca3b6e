"""Behavioral tests for MCTS-DPW, BRUE, SparseSampling, GBOP-D."""
import jax
import numpy as np
import pytest

from rl_agents_tpu.agents.tree_search.brue import BRUEAgent
from rl_agents_tpu.agents.tree_search.graph_based import GraphBasedPlannerAgent
from rl_agents_tpu.agents.tree_search.mcts_dpw import MCTSDPWAgent
from rl_agents_tpu.agents.tree_search.sparse_sampling import SparseSamplingAgent
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.envs.gridenv import make_line

TWO_ARM = {
    "mode": "deterministic",
    "transition": [[0, 1], [0, 1]],
    "reward": [[0.0, 1.0], [0.0, 1.0]],
    "terminal": [0, 0],
    "max_episode_steps": 100,
}

AGENTS = [
    (MCTSDPWAgent, {"budget": 150, "gamma": 0.8}),
    (BRUEAgent, {"budget": 150, "gamma": 0.8}),
    (SparseSamplingAgent, {"budget": 60, "gamma": 0.8, "horizon": 2, "C": 2}),
    (GraphBasedPlannerAgent, {"budget": 60, "gamma": 0.8}),
]


@pytest.mark.parametrize("agent_cls,config", AGENTS)
def test_prefers_rewarding_action(agent_cls, config):
    env = make_mdp(TWO_ARM)
    env.reset(seed=0)
    agent = agent_cls(env, config)
    agent.seed(1)
    assert agent.act(0) == 1


@pytest.mark.parametrize("agent_cls,config", AGENTS)
def test_runs_on_stochastic_env(agent_cls, config):
    env = make_line({})
    env.reset(seed=0)
    agent = agent_cls(env, config)
    agent.seed(0)
    assert agent.act(0) in (0, 1)


def test_dpw_cartpole_episode():
    env = make_cartpole({"max_episode_steps": 40})
    agent = MCTSDPWAgent(env, {"budget": 250, "gamma": 0.95, "temperature": 10,
                               "closed_loop": True})
    agent.seed(2)
    state, _ = env.reset(seed=2)
    total = 0
    done = truncated = False
    while not (done or truncated):
        state, r, done, truncated, _ = env.step(agent.act(state))
        total += r
    assert total >= 25  # should comfortably beat random (~15)


def test_gbop_aggregates_states():
    """On the 4-state loop MDP the graph planner must discover that there are
    only 4 distinct nodes (state aggregation across paths)."""
    env = make_mdp({
        "mode": "deterministic",
        "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
        "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
        "terminal": [0, 0, 0, 0],
        "max_episode_steps": 10000,
    })
    env.reset(seed=0)
    agent = GraphBasedPlannerAgent(env, {"budget": 60, "gamma": 0.8})
    agent.seed(0)
    action = agent.act(0)
    graph = agent.last_plan_data
    assert action == 1
    # MDP observation includes the step counter, so aggregation happens on
    # (state, t[, done]); nodes must still be far fewer than budget
    assert int(graph.used) <= 60
    # bounds must be ordered and tightened below the vacuous 1/(1-gamma)
    used = np.asarray(graph.expanded)
    lo = np.asarray(graph.value_lower)[used]
    hi = np.asarray(graph.value_upper)[used]
    assert np.all(lo <= hi + 1e-5)
    assert hi.max() <= 1 / (1 - 0.8) + 1e-5
