"""Bit-exact KL-OLOP parity vs the reference at fixed seeds.

The reference OLOP cannot run unmodified on current gymnasium/numpy — three
plumbing breaks, shimmed here exactly and only (SURVEY §7 hard-part 4):
``np.infty`` (removed in numpy 2), ``np_random.randint`` (Generator renamed
it to ``integers``), and the 4-tuple unpack of the 5-tuple step
(reference: olop.py:73,87). Algorithmic behavior is untouched.
"""
import sys

import numpy as np
import pytest
from jax import enable_x64

from rl_agents_tpu.agents.tree_search.olop_parity import olop_plan_parity
from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.utils.pcg64 import pcg64_init

LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}
EPISODES, HORIZON, GAMMA = 20, 4, 0.8


class _GeneratorShim:
    """numpy Generator with the legacy ``randint`` the reference calls."""

    def __init__(self, gen):
        self._gen = gen

    def randint(self, n):
        return self._gen.integers(n)

    def __getattr__(self, name):
        return getattr(self._gen, name)


def reference_olop_plan(env_handle, seed, continuation="zeros"):
    sys.path.insert(0, "/root/reference")
    np.infty = np.inf  # numpy 2 removed the alias the reference uses
    if "numba" not in sys.modules:
        import types

        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.olop import OLOP

    class RunnableOLOP(OLOP):
        def step(self, state, action):
            # the reference unpacks 4 values from the 5-tuple step
            # (olop.py:87, pre-gymnasium-migration semantics: done=terminated)
            obs, reward, terminated, truncated, _ = super().step(state, action)
            return obs, reward, terminated, truncated

    planner = RunnableOLOP(env_handle, {
        "episodes": EPISODES, "horizon": HORIZON, "gamma": GAMMA,
        "budget": EPISODES * HORIZON, "step_strategy": "reset",
        "upper_bound": {"type": "kullback-leibler", "time": "global",
                        "threshold": "4*np.log(time)"},
        "continuation_type": continuation,
    })
    planner.seed(seed)
    planner.np_random = _GeneratorShim(planner.np_random)
    planner.step_by_reset()
    actions = planner.plan(state=env_handle, observation=None)
    return [int(a) for a in actions], planner


@pytest.mark.parametrize("continuation", ["zeros", "uniform"])
@pytest.mark.parametrize("seed", [0, 5])
def test_olop_parity(seed, continuation):
    with enable_x64():
        env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
        env.reset(seed=0)
        ref_actions, ref_planner = reference_olop_plan(env.fork(), seed, continuation)

        stream, inc = pcg64_init(seed)
        actions, length, arena, _ = olop_plan_parity(
            env.functional, env.params, env.state, stream, inc,
            num_actions=3, episodes=EPISODES, horizon=HORIZON, gamma=GAMMA,
            continuation_uniform=(continuation == "uniform"))
        our_actions = [int(a) for a in np.asarray(actions)[:int(length)]]

        assert our_actions == ref_actions
        # per-root-child statistics: visit counts exact; B-values bit-exact
        # when the Newton iterates agree (XLA f64 log can drift 1 ULP on rare
        # inputs, hence the 1e-12 tolerance on the float fields)
        ch = np.asarray(arena.children[0])
        for a in range(3):
            node = ref_planner.root.children[a]
            assert int(arena.count[ch[a]]) == node.count
            np.testing.assert_allclose(float(arena.cum[ch[a]]),
                                       node.cumulative_reward, rtol=0, atol=0)
            np.testing.assert_allclose(float(arena.mu[ch[a]]), node.mu_ucb,
                                       rtol=1e-12)
            np.testing.assert_allclose(float(arena.vu[ch[a]]), node.value_upper,
                                       rtol=1e-12)
        np.testing.assert_allclose(float(arena.vu[0]), ref_planner.root.value_upper,
                                   rtol=1e-12)


def test_olop_parity_stream_alignment():
    """After planning, the device stream state equals numpy's after the same
    draw sequence (episodes x [1 env-seed integers draw] for zeros
    continuation) — proof the RNG protocol matches draw-for-draw."""
    with enable_x64():
        env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
        env.reset(seed=0)
        stream, inc = pcg64_init(11)
        _, _, _, out_stream = olop_plan_parity(
            env.functional, env.params, env.state, stream, inc,
            num_actions=3, episodes=EPISODES, horizon=HORIZON, gamma=GAMMA)
        ours = sum(int(v) << (16 * i)
                   for i, v in enumerate(np.asarray(out_stream.digits)))
        gen = np.random.Generator(np.random.PCG64(11))
        for _ in range(EPISODES):
            gen.integers(2 ** 30)
        assert ours == gen.bit_generator.state["state"]["state"]
