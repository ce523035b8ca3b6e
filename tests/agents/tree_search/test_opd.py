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


def test_opd_step_subtree_parity():
    """Re-rooting parity vs the reference's step_by_subtree + bound rescale
    (reference: abstract.py:194-206, deterministic.py:124-132): same root
    bounds, same subtree size, same multiset of in-subtree leaf bounds.
    (Two reference quirks we deliberately do not replicate: it keeps *stale
    out-of-subtree* leaves expandable, and its released step_by_subtree
    actually crashes — deterministic.py:131 rescales ``value_upper_bound``,
    an attribute that does not exist (the field is ``value_upper``). The test
    therefore drives the documented intended semantics on the reference tree:
    move the root pointer, rescale leaf bounds by (v - r0)/gamma, re-backup.)"""
    from rl_agents_tpu.agents.tree_search.deterministic import opd_step_subtree

    env = make_dynamics({})
    env.reset(seed=0)
    config = {"budget": 40, "gamma": 0.9, "step_strategy": "subtree", "terminal_reward": 0}
    ref_actions, ref_planner = reference_opd_plan(env.fork(), config)
    a0 = ref_actions[0]
    ref_root = ref_planner.root.children[a0]
    ref_root.parent = None
    r0, gamma = ref_root.reward, config["gamma"]

    def ref_subtree_leaves(node, acc):
        if node.children:
            for c in node.children.values():
                ref_subtree_leaves(c, acc)
        else:
            node.value_lower = (node.value_lower - r0) / gamma
            node.value_upper = (node.value_upper - r0) / gamma
            acc.append((float(node.value_lower), float(node.value_upper)))
        return acc

    def ref_size(node):
        return 1 + sum(ref_size(c) for c in node.children.values())

    actions, length, tree = opd_plan(
        env.functional, env.params, env.state, jax.random.PRNGKey(0),
        num_actions=2, expansions=40 // 2, gamma=0.9, plan_capacity=32)
    new_tree, valid = opd_step_subtree(tree, a0, 0.9, num_actions=2, out_capacity=64)
    assert bool(valid)
    used = int(new_tree.used)
    assert used == ref_size(ref_root)
    assert int(new_tree.depth[0]) == 0

    refs = sorted(ref_subtree_leaves(ref_root, []))  # rescales ref leaves in place
    ref_root.backup_values()
    np.testing.assert_allclose(float(new_tree.value_lower[0]), ref_root.value_lower, rtol=1e-5)
    np.testing.assert_allclose(float(new_tree.value_upper[0]), ref_root.value_upper, rtol=1e-5)

    leaf_mask = np.asarray(new_tree.leaf)[:used]
    ours = sorted(zip(np.asarray(new_tree.value_lower)[:used][leaf_mask].tolist(),
                      np.asarray(new_tree.value_upper)[:used][leaf_mask].tolist()))
    assert len(ours) == len(refs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(refs), rtol=1e-5)


def test_opd_step_subtree_unexplored_action():
    from rl_agents_tpu.agents.tree_search.deterministic import opd_step_subtree

    env = make_dynamics({})
    env.reset(seed=0)
    _, _, tree = opd_plan(env.functional, env.params, env.state, jax.random.PRNGKey(0),
                          num_actions=2, expansions=1, gamma=0.9, plan_capacity=8)
    # chop the root's children to simulate an unexplored action
    tree = tree._replace(children=tree.children.at[0, 1].set(-1))
    _, valid = opd_step_subtree(tree, 1, 0.9, num_actions=2, out_capacity=8)
    assert not bool(valid)


def test_opd_subtree_agent_e2e():
    """Agent with step_strategy=subtree carries the arena between env steps and
    keeps planning in it; with equal budget it must do at least as well as the
    reset-strategy agent on a deterministic loop MDP (the carried tree only
    adds information), and here it actually resolves the better action from
    state 1 (a=2, 0.9-then-loop) that budget-30 replanning-from-scratch misses."""
    env_a = make_mdp(dict(LOOP_CONFIG, max_episode_steps=50)); env_a.reset(seed=0)
    env_b = make_mdp(dict(LOOP_CONFIG, max_episode_steps=50)); env_b.reset(seed=0)
    sub = DeterministicPlannerAgent(env_a, {"budget": 30, "gamma": 0.8,
                                            "step_strategy": "subtree"})
    rst = DeterministicPlannerAgent(env_b, {"budget": 30, "gamma": 0.8})
    sub.seed(0); rst.seed(0)
    obs = np.zeros(1)
    ret_sub = ret_rst = 0.0
    for t in range(5):
        a_sub = sub.act(obs)
        a_rst = rst.act(obs)
        if t == 0:
            assert a_sub == a_rst == 1  # identical first plan (no carry yet)
        _, r_a, *_ = env_a.step(a_sub)
        _, r_b, *_ = env_b.step(a_rst)
        ret_sub += 0.8 ** t * float(r_a)
        ret_rst += 0.8 ** t * float(r_b)
    assert ret_sub >= ret_rst - 1e-6
    assert sub.carried_tree is not None
    # the carried arena really is reused: it holds nodes from previous plans
    assert int(sub.carried_tree.used) > 1
    sub.reset()
    assert sub.carried_tree is None


def test_opd_bit_exact_parity_with_ties():
    """The BASELINE.md north star: bit-exact planner trajectories at a fixed
    seed INCLUDING random tie-breaking. The device PCG64 stream reproduces the
    reference's np_random draws exactly (gymnasium seeding -> Generator(PCG64)),
    so on a tie-rich symmetric MDP the full greedy plan matches the reference
    action-for-action across seeds (reference: abstract.py:143-156 get_plan,
    :295-311 random_argmax; deterministic.py:21-26 selection_rule).

    gamma and rewards are dyadic (0.5, 1.0) so every bound value is exactly
    representable in BOTH float32 (ours) and float64 (reference) — tie sets
    are then mathematical, not rounding artifacts. (With non-dyadic gamma the
    reference's expansion order itself depends on float64 rounding noise in
    ``gamma ** depth``; that noise is explicitly out of the parity contract.)"""
    from rl_agents_tpu.agents.tree_search.deterministic import opd_plan_parity
    from rl_agents_tpu.utils.pcg64 import pcg64_init

    tie_mdp = {
        "mode": "deterministic",
        # s0: a0/a1 tie (symmetric branches s1/s2); s1,s2: a1/a2 tie; s3 absorbing
        "transition": [[1, 2, 0], [1, 3, 3], [2, 3, 3], [3, 3, 3]],
        "reward": [[0.5, 0.5, 0.0], [1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0, 0, 0]],
        "terminal": [0, 0, 0, 0],
        "max_episode_steps": 100,
    }
    env = make_mdp(tie_mdp)
    env.reset(seed=0)
    budget = 60

    for seed in (0, 1, 7, 42):
        config = {"budget": budget, "gamma": 0.5, "step_strategy": "reset",
                  "terminal_reward": 0}
        sys.path.insert(0, "/root/reference")
        if "numba" not in sys.modules:  # the image has no numba; stub @jit
            import types

            numba = types.ModuleType("numba")
            numba.jit = lambda *a, **k: (lambda f: f)
            sys.modules["numba"] = numba
        from rl_agents.agents.tree_search.deterministic import (
            OptimisticDeterministicPlanner,
        )

        handle = env.fork()
        planner = OptimisticDeterministicPlanner(handle, config)
        planner.seed(seed)
        planner.step_by_reset()
        ref_actions = [int(a) for a in planner.plan(state=handle, observation=None)]

        stream, inc = pcg64_init(seed)
        actions, length, tree, _ = opd_plan_parity(
            env.functional, env.params, env.state, stream, inc,
            num_actions=3, expansions=budget // 3, gamma=0.5, plan_capacity=32)
        ours = [int(a) for a in np.asarray(actions)[:int(length)]]
        assert ours == ref_actions, (seed, ours, ref_actions)


def test_opd_batch_fused_matches_vmap_oracle():
    """The fused [N, B] lane-major batch planner produces bit-identical
    arenas (bounds, structure, counts) and identical greedy plans to the
    vmapped single-tree program it replaces on the hot path."""
    from rl_agents_tpu.agents.tree_search.deterministic import opd_plan_batch_vmap
    from rl_agents_tpu.envs.finite_mdp import make as make_finite_mdp

    env = make_finite_mdp({
        "mode": "deterministic",
        "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
        "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
        "terminal": [0, 0, 0, 0], "max_episode_steps": 10000})
    env.reset(seed=0)
    B = 8
    states0 = jax.tree.map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), env.state)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    kwargs = dict(num_actions=3, expansions=10, gamma=0.9, plan_capacity=8)

    af, lf, tf = opd_plan_batch(env.functional, env.params, states0, keys, **kwargs)
    av, lv, tv = opd_plan_batch_vmap(env.functional, env.params, states0, keys, **kwargs)
    for field in ("value_lower", "value_upper", "depth", "parent", "children",
                  "count", "reward", "done", "leaf"):
        np.testing.assert_array_equal(np.asarray(getattr(tf, field)),
                                      np.asarray(getattr(tv, field)), err_msg=field)
    # gamma 0.9 on the loop MDP has no value ties: plans must coincide exactly
    np.testing.assert_array_equal(np.asarray(af), np.asarray(av))
    np.testing.assert_array_equal(np.asarray(lf), np.asarray(lv))
