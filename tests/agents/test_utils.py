"""Golden-value math-kernel tests.

Mirrors the reference's verification strategy and constants
(reference: tests/agents/test_utils.py:8-75) against the jnp rebuilds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.utils import (
    bernoulli_kullback_leibler,
    d_bernoulli_kullback_leibler_dq,
    kl_upper_bound,
    kullback_leibler,
    max_expectation_under_constraint,
    max_expectation_under_constraint_batch,
)


def test_bernoulli_kullback_leibler():
    assert bernoulli_kullback_leibler(0, 1) == jnp.inf
    rng = np.random.default_rng(0)
    q = rng.random()
    assert bernoulli_kullback_leibler(0, q) > 0
    assert bernoulli_kullback_leibler(q, q) == pytest.approx(0, abs=1e-6)

    x = np.sort(rng.uniform(0, 1, 10))
    for i in range(x.size - 1):
        assert bernoulli_kullback_leibler(x[0], x[i]) < bernoulli_kullback_leibler(x[0], x[i + 1])


def test_d_bernoulli_kullback_leibler_dq():
    rng = np.random.default_rng(1)
    p, q = rng.uniform(0.1, 0.9, 2)
    eps = 1e-3
    fd = (bernoulli_kullback_leibler(p, q + eps) - bernoulli_kullback_leibler(p, q - eps)) / (2 * eps)
    assert float(d_bernoulli_kullback_leibler_dq(p, q)) == pytest.approx(float(fd), rel=1e-2)


def test_kl_upper_bound_golden():
    # Reference golden constants (tests/agents/test_utils.py:28-31)
    assert float(kl_upper_bound(0.5 * 1, 1, threshold=np.log(10), eps=1e-3)) == pytest.approx(0.997, abs=2e-3)
    assert float(kl_upper_bound(0.5 * 10, 10, threshold=np.log(20), eps=1e-3)) == pytest.approx(0.835, abs=2e-3)
    assert float(kl_upper_bound(0.5 * 20, 20, threshold=np.log(40), eps=1e-3)) == pytest.approx(0.777, abs=2e-3)


def test_kl_upper_bound_inverts_divergence():
    rng = np.random.default_rng(2)
    for _ in range(5):
        count, time = np.sort(rng.integers(1, 500, 2))
        mu = rng.random()
        ucb = kl_upper_bound(mu * count, count, threshold=np.log(time), eps=1e-3)
        assert not jnp.isnan(ucb)
        d_max = np.log(time) / count
        assert float(bernoulli_kullback_leibler(mu, ucb)) == pytest.approx(d_max, abs=1e-1)


def test_kl_upper_bound_edge_cases():
    assert float(kl_upper_bound(0.0, 0)) == 1.0
    assert float(kl_upper_bound(0.0, 0, lower=True)) == 0.0
    # mu == 1 with upper bound: degenerate interval
    assert float(kl_upper_bound(5.0, 5, threshold=np.log(10))) == pytest.approx(1.0, abs=1e-6)


def test_kl_upper_bound_vmap():
    sums = jnp.array([0.5, 5.0, 10.0])
    counts = jnp.array([1.0, 10.0, 20.0])
    thresholds = jnp.log(jnp.array([10.0, 20.0, 40.0]))
    out = jax.vmap(lambda s, c, t: kl_upper_bound(s, c, t, eps=1e-3))(sums, counts, thresholds)
    np.testing.assert_allclose(np.asarray(out), [0.997, 0.835, 0.777], atol=2e-3)


def test_max_expectation_constrained_edge1():
    q = np.array([0, 0, 1, 1], dtype=float)
    q /= q.sum()
    f = np.array([1, 1, 0, 0], dtype=float)
    c = 0.3
    p = np.asarray(max_expectation_under_constraint(f, q, c, eps=1e-3))
    kl = float(kullback_leibler(q, p))
    assert q @ f <= p @ f
    assert c - 1e-1 <= kl <= c + 1e-1


def test_max_expectation_constrained_edge2():
    q = np.array([0, 1, 1], dtype=float)
    q /= q.sum()
    f = np.array([0, 1, 1], dtype=float)
    c = 0.1
    p = np.asarray(max_expectation_under_constraint(f, q, c, eps=1e-3))
    kl = float(kullback_leibler(q, p))
    assert q @ f <= p @ f
    assert kl <= c + 1e-1


def test_max_expectation_constrained_random():
    rng = np.random.default_rng(3)
    for _ in range(50):
        q = rng.random(10)
        q /= q.sum()
        f = rng.random(10)
        c = rng.random()
        p = np.asarray(max_expectation_under_constraint(f, q, c, eps=1e-4))
        kl = float(q @ np.log(q / np.maximum(p, 1e-12)))
        assert q @ f <= p @ f + 1e-5
        assert c - 1e-1 <= kl <= c + 1e-1


def test_max_expectation_constrained_batch():
    rng = np.random.default_rng(4)
    B, n = 32, 8
    q = rng.random((B, n))
    q /= q.sum(-1, keepdims=True)
    f = rng.random((B, n))
    c = rng.random(B)
    p = np.asarray(max_expectation_under_constraint_batch(jnp.asarray(f), jnp.asarray(q), jnp.asarray(c)))
    assert p.shape == (B, n)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-3)
    assert np.all((q * f).sum(-1) <= (p * f).sum(-1) + 1e-4)
