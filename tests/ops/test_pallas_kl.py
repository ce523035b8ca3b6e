"""Pallas KL-UCB kernel: parity with the XLA solver and the reference's
golden constants. Runs in interpret mode under the CPU test backend; the
same kernel compiles with Mosaic on real TPU hardware (measurements in
docs/pallas.md)."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.ops.pallas_kl import kl_bound_pallas
from rl_agents_tpu.utils.math import kl_upper_bound


def test_pallas_kl_matches_xla_batch():
    rng = np.random.default_rng(0)
    count = rng.integers(0, 50, size=2000).astype(np.float32)
    total = rng.random(2000).astype(np.float32) * count
    thr = np.full(2000, np.log(10.0), np.float32)

    for lower in (False, True):
        ours = kl_bound_pallas(total, count, thr, lower=lower, interpret=True)
        ref = jax.vmap(lambda s, n, t: kl_upper_bound(s, n, t, lower=lower))(
            jnp.asarray(total), jnp.asarray(count), jnp.asarray(thr))
        # both run the same guarded Newton math; the stopping rules differ
        # (per-element freeze vs batch-wide), so compare at solver tolerance
        assert np.allclose(np.asarray(ours), np.asarray(ref), atol=2e-2)


def test_pallas_kl_golden_constant():
    """Reference golden value (reference tests/agents/test_utils.py):
    kl_upper_bound(0.5, 1, log 10) ~= 0.9975."""
    out = kl_bound_pallas(np.float32(0.5), np.float32(1.0),
                          np.float32(np.log(10.0)), interpret=True)
    assert abs(float(out) - 0.9975) < 1e-3


def test_pallas_kl_edge_cases():
    # zero counts -> vacuous bounds; mu at the boundary -> degenerate interval
    total = np.array([0.0, 0.0, 5.0, 0.0], np.float32)
    count = np.array([0.0, 3.0, 5.0, 4.0], np.float32)
    thr = np.full(4, 2.0, np.float32)
    up = np.asarray(kl_bound_pallas(total, count, thr, interpret=True))
    lo = np.asarray(kl_bound_pallas(total, count, thr, lower=True, interpret=True))
    assert up[0] == 1.0 and lo[0] == 0.0          # no data
    assert up[2] == 1.0 and lo[3] == 0.0          # mu on the boundary
    assert 0.0 < up[1] < 1.0                      # informative UCB
    assert np.all(lo <= up + 1e-6)


def test_pallas_kl_arbitrary_shapes():
    # non-multiple-of-128 sizes and 2-D inputs round-trip through padding
    rng = np.random.default_rng(1)
    count = rng.integers(1, 9, size=(7, 13)).astype(np.float32)
    total = rng.random((7, 13)).astype(np.float32) * count
    out = kl_bound_pallas(total, count, np.float32(1.0), interpret=True)
    assert out.shape == (7, 13)
    assert np.all((np.asarray(out) >= 0) & (np.asarray(out) <= 1))
