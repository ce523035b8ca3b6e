"""Equivalence vs the reference for PlaTyPOOS and TrailBlazer
(VERDICT r3 item 3) — the last two planner families without a direct
reference comparison.

Bars, matching each family's randomness structure (house style of
test_family_equivalence.py):

* **PlaTyPOOS, deterministic MDP** — the schedule (layer sizes, evaluation
  counts, candidate tracking) is a deterministic function of
  (budget/horizon, gamma); on a deterministic MDP every oracle call returns
  the same transition, so the recommended plan is draw-independent: exact
  per-config equality (reference: platypoos.py:30-101).
* **PlaTyPOOS, stochastic MDP** — oracle draws interleave differently, so
  the bar is the recommended-action distribution over many seeds
  (reference: platypoos.py:155-166 reseeds each sampled copy).
* **TrailBlazer, deterministic MDP** — the (m, epsilon, eta) recursion is
  deterministic given the MDP: the returned root value must match to float
  tolerance across configs (reference: trailblazer.py:20-117).
* **TrailBlazer, stochastic MDP** — value agreement band over seeds. NOTE:
  the shipped reference does NOT reseed its ``copy.deepcopy``'d oracle
  copies (trailblazer.py:70, unlike platypoos.py:156), so sibling samples
  of an AvgNode replay the same RNG state and the sample average
  degenerates to one draw. The shim below restores the algorithm's intended
  independent sampling by reseeding each copy, mirroring how
  test_family_equivalence.py patches the reference's shipped GBOP bugs.
"""
import copy
import sys
import types

import jax
import numpy as np
import pytest

from rl_agents_tpu.agents.tree_search.platypoos import PlaTyPOOSAgent
from rl_agents_tpu.agents.tree_search.trailblazer import TrailBlazer
from rl_agents_tpu.envs.finite_mdp import make as make_mdp

LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}
# the reference's own TrailBlazer harness MDP (trailblazer.py:121-137)
TB_CONFIG = {
    "mode": "deterministic",
    "transition": [[1, 2], [1, 1], [2, 2], [3, 3]],
    "reward": [[0.5, 1], [0, 0], [0, 0], [0, 0]],
    "terminal": [0, 0, 0, 0],
}
STOCH_CONFIG = {
    "mode": "stochastic",
    "transition": [
        [[0.7, 0.2, 0.1, 0.0], [0.3, 0.3, 0.3, 0.1], [0.1, 0.1, 0.3, 0.5]],
        [[0.6, 0.3, 0.1, 0.0], [0.2, 0.4, 0.3, 0.1], [0.0, 0.2, 0.3, 0.5]],
        [[0.5, 0.3, 0.2, 0.0], [0.2, 0.3, 0.4, 0.1], [0.1, 0.1, 0.3, 0.5]],
        [[0.3, 0.3, 0.2, 0.2], [0.1, 0.3, 0.3, 0.3], [0.0, 0.1, 0.2, 0.7]],
    ],
    "reward": [
        [0.55, 0.5, 0.0],
        [0.5, 0.55, 0.0],
        [0.4, 0.4, 0.0],
        [0.0, 0.0, 0.0],
    ],
    "terminal": [0, 0, 0, 0],
}


def _bootstrap_reference():
    sys.path.insert(0, "/root/reference")
    np.infty = np.inf
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    # Shipped reference bug: PlaTyPOOSNode.update reads self.value /
    # parent.value before any update ever sets it, and the base Node class
    # (abstract.py:212-231) defines no ``value`` — the planner crashes on its
    # own. Restore the obvious intended zero initialization as a class
    # default (instance updates shadow it), mirroring the GBOP bug patches in
    # test_family_equivalence.py.
    from rl_agents.agents.tree_search.platypoos import PlaTyPOOSNode
    PlaTyPOOSNode.value = 0


class _GeneratorShim:
    def __init__(self, gen):
        self._gen = gen

    def randint(self, n):
        return self._gen.integers(n)

    def __getattr__(self, name):
        return getattr(self._gen, name)


class _FourTupleEnv:
    def __init__(self, handle):
        self._h = handle

    def step(self, action):
        obs, reward, term, trunc, _ = self._h.step(action)
        return obs, reward, term or trunc, {}

    def __deepcopy__(self, memo):
        # handle.fork() IS the deep copy for immutable-pytree envs
        return _FourTupleEnv(self._h.fork())

    def __getattr__(self, name):
        return getattr(self._h, name)


def _seeded(planner, seed):
    planner.seed(seed)
    planner.np_random = _GeneratorShim(planner.np_random)
    return planner


# ---------------------------------------------------------------------------
# PlaTyPOOS
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gamma,horizon", [(0.7, 4), (0.8, 5), (0.9, 6)])
def test_platypoos_exact_plan_parity_deterministic(gamma, horizon):
    """Deterministic MDP: schedule and values are draw-independent, so the
    recommended first action matches the reference exactly for every
    (gamma, horizon) (reference: platypoos.py:30-101)."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search.platypoos import PlaTyPOOS

    env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=10000))
    env.reset(seed=0)

    planner = _seeded(PlaTyPOOS(env, {"gamma": gamma, "horizon": horizon,
                                      "budget": 1000}), 0)
    planner.reset()
    ref_plan = planner.plan(state=_FourTupleEnv(env.fork()), observation=None)

    agent = PlaTyPOOSAgent(env, {"gamma": gamma, "horizon": horizon,
                                 "budget": 1000})
    agent.seed(0)
    our_plan = agent.plan(0)
    assert int(our_plan[0]) == int(ref_plan[0]), (ref_plan, our_plan)


def test_platypoos_action_distribution_stochastic():
    """Stochastic MDP: recommended-action distribution over seeds
    (reference: platypoos.py:155-166; per-copy reseeds make its draws i.i.d.
    like ours, so only scheduling noise separates the two sides)."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search.platypoos import PlaTyPOOS

    SEEDS = 100
    env = make_mdp(dict(STOCH_CONFIG, max_episode_steps=10000))
    env.reset(seed=0)
    cfg = {"gamma": 0.8, "horizon": 4, "budget": 1000}

    ref_counts = np.zeros(3, int)
    for seed in range(SEEDS):
        planner = _seeded(PlaTyPOOS(env, dict(cfg)), seed)
        planner.reset()
        plan = planner.plan(state=_FourTupleEnv(env.fork()), observation=None)
        ref_counts[int(plan[0])] += 1

    our_counts = np.zeros(3, int)
    for seed in range(SEEDS):
        agent = PlaTyPOOSAgent(env, dict(cfg))
        agent.seed(seed)
        our_counts[int(agent.plan(0)[0])] += 1

    ref_p = ref_counts / SEEDS
    our_p = our_counts / SEEDS
    tv = 0.5 * np.abs(ref_p - our_p).sum()
    assert ref_counts.argmax() == our_counts.argmax()
    assert tv <= 0.15, (ref_counts.tolist(), our_counts.tolist(), tv)


# ---------------------------------------------------------------------------
# TrailBlazer
# ---------------------------------------------------------------------------

class _TBEnv:
    """Reference TrailBlazer env contract: 4-tuple step, deepcopy forking,
    ``mdp.state`` identity for node dedup (trailblazer.py:41-43)."""

    def __init__(self, handle):
        self._h = handle
        self.mdp = types.SimpleNamespace(state=int(np.asarray(handle.state.s)))

    @property
    def action_space(self):
        return self._h.action_space

    def step(self, action):
        obs, reward, term, trunc, _ = self._h.step(action)
        self.mdp = types.SimpleNamespace(state=int(np.asarray(self._h.state.s)))
        return obs, reward, term or trunc, {}

    def __deepcopy__(self, memo):
        # handle.fork() IS the deep copy for immutable-pytree envs (and
        # ~1000x cheaper than deep-copying the jitted wrappers)
        new = type(self).__new__(type(self))
        new._h = self._h.fork()
        new.mdp = types.SimpleNamespace(state=self.mdp.state)
        return new


class _TBStochEnv(_TBEnv):
    """Restores the intended i.i.d. oracle sampling: each deepcopy'd oracle
    copy is reseeded (the shipped reference replays one RNG state across an
    AvgNode's sibling samples — see module docstring)."""

    RNG = np.random.default_rng(0)

    def __deepcopy__(self, memo):
        handle = self._h.fork()
        handle.seed(int(_TBStochEnv.RNG.integers(2 ** 31)))
        new = _TBStochEnv.__new__(_TBStochEnv)
        new._h = handle
        new.mdp = types.SimpleNamespace(state=self.mdp.state)
        return new


@pytest.mark.parametrize("gamma,epsilon", [(0.5, 4.0), (0.45, 4.0), (0.4, 3.0)])
def test_trailblazer_exact_value_parity_deterministic(gamma, epsilon):
    """Deterministic MDPs: the (m, epsilon/gamma) recursion visits the same
    nodes with the same counts on both sides — root values match to float
    tolerance (reference: trailblazer.py:20-117, incl. its own test MDP).

    Config note: the UNCAPPED reference's confidence loop (trailblazer.py:26,
    ``while U >= (1-eta)*eps``) needs exponentially many refinement rounds as
    epsilon shrinks or gamma grows — (0.5, 2.0) and (0.55, 4.0) already run
    for minutes on a 4-state MDP (measured). The configs here are the
    non-trivial feasible set: values 1.0/1.45/1.36 vs the trivial 0 returned
    once epsilon >= 1/(1-gamma)."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search.trailblazer import TrailBlazer as RefTB

    for config in (TB_CONFIG, LOOP_CONFIG):
        env = make_mdp(dict(config, max_episode_steps=10000))
        env.reset(seed=0)

        ref_value = RefTB(_TBEnv(env.fork()), gamma=gamma, delta=0.1,
                          epsilon=epsilon).run()
        our_value = TrailBlazer(env, gamma=gamma, delta=0.1,
                                epsilon=epsilon).run()
        assert np.isclose(float(our_value), float(ref_value),
                          rtol=1e-6, atol=1e-8), (config is TB_CONFIG,
                                                  ref_value, our_value)


# 3-state, 2-action stochastic MDP: K=2 keeps the reference's uncapped
# refinement loop to seconds per run (it scales steeply with the action count)
TB_STOCH_CONFIG = {
    "mode": "stochastic",
    "transition": [
        [[0.7, 0.2, 0.1], [0.2, 0.5, 0.3]],
        [[0.5, 0.4, 0.1], [0.1, 0.5, 0.4]],
        [[0.3, 0.3, 0.4], [0.2, 0.2, 0.6]],
    ],
    "reward": [[0.6, 0.5], [0.3, 0.3], [0.1, 0.1]],
    "terminal": [0, 0, 0],
}


def test_trailblazer_value_band_stochastic():
    """Stochastic MDP: with the reference's sampling independence restored,
    both sides' root-value estimates are unbiased estimates of the same
    quantity — their means over seeds must agree within a combined
    standard-error band plus float slack (reference: trailblazer.py:62-92;
    measured: ref ~0.848 +/- 0.001 vs ours ~0.845 +/- 0.003)."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search.trailblazer import TrailBlazer as RefTB

    SEEDS = 6
    env = make_mdp(dict(TB_STOCH_CONFIG, max_episode_steps=10000))
    env.reset(seed=0)
    kw = dict(gamma=0.5, delta=0.1, epsilon=4.0)

    _TBStochEnv.RNG = np.random.default_rng(1234)
    ref_vals = np.array([RefTB(_TBStochEnv(env.fork()), **kw).run()
                         for _ in range(SEEDS)], float)
    our_vals = np.array([TrailBlazer(env, seed=s, **kw).run()
                         for s in range(SEEDS)], float)

    se = np.sqrt(ref_vals.var() / SEEDS + our_vals.var() / SEEDS)
    diff = abs(ref_vals.mean() - our_vals.mean())
    assert diff <= 4.0 * se + 0.02, (ref_vals.mean(), our_vals.mean(), se)
