"""OPD planner tests, incl. trajectory parity vs the reference implementation
running on the same functional env handles (BASELINE.md parity bar)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.agents.tree_search.deterministic import (
    DeterministicPlannerAgent,
    opd_plan,
    opd_plan_batch,
)
from rl_agents_tpu.envs.dynamics import make as make_dynamics
from rl_agents_tpu.envs.finite_mdp import make as make_mdp

LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}


def reference_opd_plan(env_handle, config):
    """Run the reference OPD planner against our EnvHandle (which quacks like
    a gym env and forks cheaply)."""
    sys.path.insert(0, "/root/reference")
    if "numba" not in sys.modules:  # the image has no numba; stub @jit
        import types

        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.deterministic import OptimisticDeterministicPlanner

    planner = OptimisticDeterministicPlanner(env_handle, config)
    planner.seed(0)
    planner.step_by_reset()  # the agent shell resets the tree before planning
    actions = planner.plan(state=env_handle, observation=None)
    return [int(a) for a in actions], planner


def test_opd_parity_dynamics_env():
    """Same expansions, same bounds, same plan as the reference on the
    double-integrator env (no reward ties)."""
    env = make_dynamics({})
    env.reset(seed=0)
    config = {"budget": 40, "gamma": 0.9, "step_strategy": "reset", "terminal_reward": 0}

    ref_actions, ref_planner = reference_opd_plan(env.fork(), config)

    actions, length, tree = opd_plan(
        env.functional, env.params, env.state, jax.random.PRNGKey(0),
        num_actions=2, expansions=40 // 2, gamma=0.9, plan_capacity=32)
    our_actions = [int(a) for a in np.asarray(actions)[:int(length)]]

    assert our_actions == ref_actions
    np.testing.assert_allclose(float(tree.value_lower[0]), ref_planner.root.value_lower,
                               rtol=1e-5)
    np.testing.assert_allclose(float(tree.value_upper[0]), ref_planner.root.value_upper,
                               rtol=1e-5)


def test_opd_parity_finite_mdp():
    env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
    env.reset(seed=0)
    config = {"budget": 60, "gamma": 0.8, "step_strategy": "reset", "terminal_reward": 0}
    ref_actions, ref_planner = reference_opd_plan(env.fork(), config)

    actions, length, tree = opd_plan(
        env.functional, env.params, env.state, jax.random.PRNGKey(0),
        num_actions=3, expansions=60 // 3, gamma=0.8, plan_capacity=32)

    np.testing.assert_allclose(float(tree.value_lower[0]), ref_planner.root.value_lower,
                               rtol=1e-5)
    np.testing.assert_allclose(float(tree.value_upper[0]), ref_planner.root.value_upper,
                               rtol=1e-5)
    # first action agreement (unique optimum: action 1 pays 1.0 from state 0)
    our_actions = [int(a) for a in np.asarray(actions)[:int(length)]]
    assert our_actions[0] == ref_actions[0] == 1


def test_opd_agent_interface():
    env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=50))
    env.reset(seed=0)
    agent = DeterministicPlannerAgent(env, {"budget": 30, "gamma": 0.8})
    agent.seed(0)
    action = agent.act(np.zeros(1))
    assert action == 1  # immediate reward 1.0 from state 0
    # receding horizon reuse: plan() consumes previous actions
    agent2 = DeterministicPlannerAgent(env, {"budget": 30, "gamma": 0.8,
                                             "receding_horizon": 3})
    agent2.seed(0)
    plan1 = agent2.plan(np.zeros(1))
    plan2 = agent2.plan(np.zeros(1))
    assert plan2 == plan1[1:]


def test_opd_batch():
    env = make_dynamics({})
    env.reset(seed=0)
    B = 16
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)), env.state)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    actions, lengths, trees = opd_plan_batch(
        env.functional, env.params, states0, keys,
        num_actions=2, expansions=10, gamma=0.9, plan_capacity=16)
    assert actions.shape == (B, 16)
    # identical states -> identical root bounds across the batch
    np.testing.assert_allclose(np.asarray(trees.value_upper[:, 0]),
                               np.asarray(trees.value_upper[0, 0]), rtol=1e-6)


def test_opd_reward_bound_check():
    """Rewards outside [0,1] are rejected by the reference (deterministic.py:46);
    our functional envs used with OPD keep rewards in [0,1] by construction —
    assert that on the envs we ship."""
    env = make_dynamics({})
    env.reset(seed=0)
    out = env.functional.rollout(env.params, env.state,
                                 jnp.zeros(50, jnp.int32), jax.random.PRNGKey(0))
    assert float(out.reward.min()) >= 0 and float(out.reward.max()) <= 1
