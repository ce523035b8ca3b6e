"""Statistical equivalence of BRUE vs the reference (VERDICT r1 item 3).

BRUE's draw order cannot be matched one-to-one (the reference interleaves
env-seed draws, per-step uniform actions, and count-weighted outcome draws
through host object traversal), so the parity bar here is distributional:
over many fixed seeds, the recommended-action distribution of the
array-encoded planner must match the reference's within sampling tolerance
on the same MDP (reference: brue.py:24-71).
"""
import sys

import jax
import numpy as np
import pytest

from rl_agents_tpu.agents.tree_search.brue import brue_plan
from rl_agents_tpu.envs.finite_mdp import make as make_mdp

LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}
# 480-seed audit: ref [4,257,219] vs ours [9,274,197], TV 0.046 — the true
# RNG-order offset is ~0.05; at 240 seeds the 0.15 bound is offset+~3.3sigma
BUDGET, HORIZON, GAMMA, SEEDS = 40, 4, 0.8, 240


def reference_brue_actions(env_handle):
    sys.path.insert(0, "/root/reference")
    np.infty = np.inf
    if "numba" not in sys.modules:
        import types

        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.brue import BRUE

    class _GeneratorShim:
        def __init__(self, gen):
            self._gen = gen

        def randint(self, n):
            return self._gen.integers(n)

        def __getattr__(self, name):
            return getattr(self._gen, name)

    class RunnableBRUE(BRUE):
        def step(self, state, action):
            obs, reward, terminated, truncated, _ = super().step(state, action)
            return obs, reward, terminated, truncated

    counts = np.zeros(3, int)
    for seed in range(SEEDS):
        planner = RunnableBRUE(env_handle, {
            "budget": BUDGET, "horizon": HORIZON, "gamma": GAMMA,
            "step_strategy": "reset"})
        planner.seed(seed)
        planner.np_random = _GeneratorShim(planner.np_random)
        planner.step_by_reset()
        actions = planner.plan(state=env_handle, observation=None)
        counts[int(actions[0])] += 1
    return counts


def test_brue_action_distribution_equivalence():
    env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
    env.reset(seed=0)
    ref_counts = reference_brue_actions(env.fork())

    keys = jax.random.split(jax.random.PRNGKey(0), SEEDS)
    actions, _ = jax.vmap(
        lambda k: brue_plan(env.functional, env.params, env.state, k,
                            num_actions=3, budget=BUDGET, horizon=HORIZON,
                            gamma=GAMMA, width=8))(keys)
    our_counts = np.bincount(np.asarray(actions).ravel(), minlength=3)

    ref_p = ref_counts / ref_counts.sum()
    our_p = our_counts / our_counts.sum()
    tv = 0.5 * np.abs(ref_p - our_p).sum()
    # same modal recommendation and close distributions
    assert ref_counts.argmax() == our_counts.argmax()
    assert tv <= 0.15, (ref_counts.tolist(), our_counts.tolist())
