"""Math kernels: KL confidence bounds and constrained-KL optimisation in JAX.

TPU-native rebuild of the reference math utilities (rl_agents/utils.py:43-366).
The reference solves these per-node on the host with numba kernels
(utils.py:252-289); here every solver is a fixed-iteration jnp program that is
jit-able and vmap-able over node/tree batches, so planners evaluate thousands
of confidence bounds in one fused XLA computation. Golden-value parity targets
are the constants of reference tests/agents/test_utils.py:28-40.
"""
from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

NEWTON_MAX_ITERATIONS = 100
NEWTON_OOB_WEIGHT = 0.9  # out-of-bounds relaxation weight (reference utils.py:151)


# ---------------------------------------------------------------------------
# Small numeric helpers
# ---------------------------------------------------------------------------

def constrain(x, a, b):
    return jnp.minimum(jnp.maximum(x, a), b)


def not_zero(x, eps: float = 0.01):
    return jnp.where(jnp.abs(x) > eps, x, jnp.where(x >= 0, eps, -eps))


def wrap_to_pi(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def remap(v, x, y, clip: bool = False):
    out = y[0] + (v - x[0]) * (y[1] - y[0]) / (x[1] - x[0])
    if clip:
        out = constrain(out, y[0], y[1])
    return out


def pos(x):
    return jnp.maximum(x, 0)


def neg(x):
    return jnp.maximum(-x, 0)


def near_split(x: int, num_bins: int | None = None, size_bins: int | None = None) -> List[int]:
    """Split an integer into near-even bins (host helper; reference utils.py:43-58)."""
    if num_bins:
        quotient, remainder = divmod(x, num_bins)
        return [quotient + 1] * remainder + [quotient] * (num_bins - remainder)
    elif size_bins:
        return near_split(x, num_bins=int(np.ceil(x / size_bins)))
    return []


def zip_with_singletons(*args):
    import itertools

    return zip(*(arg if isinstance(arg, list) else itertools.repeat(arg) for arg in args))


def random_dist(key, n: int):
    q = jax.random.uniform(key, (n,))
    return q / q.sum()


# ---------------------------------------------------------------------------
# Argmax with tie-breaking
# ---------------------------------------------------------------------------

def all_argmax(x) -> jnp.ndarray:
    """Boolean mask of all (near-)maximisers of x (reference utils.py:345-351)."""
    x = jnp.asarray(x)
    m = jnp.max(x)
    return jnp.isclose(x, m)


def random_argmax(key, x) -> jnp.ndarray:
    """Uniformly random index among the maximisers of ``x``.

    Tie-break parity with reference utils.py:354-361 (all_argmax + choice):
    sampling is uniform over the isclose-to-max set.
    """
    mask = all_argmax(x)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits)


def masked_argmax(x, mask):
    """Argmax of x restricted to ``mask``; returns -1 when mask is empty."""
    x = jnp.where(mask, x, -jnp.inf)
    idx = jnp.argmax(x)
    return jnp.where(jnp.any(mask), idx, -1)


# ---------------------------------------------------------------------------
# KL divergences
# ---------------------------------------------------------------------------

def kullback_leibler(p, q):
    """KL(p||q) between categorical distributions (reference utils.py:72-86)."""
    p = jnp.asarray(p, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    q = jnp.asarray(q, dtype=p.dtype)
    terms = jnp.where(p > 0, p * jnp.log(jnp.where(p > 0, p, 1.0) / jnp.where(q > 0, q, 1.0)), 0.0)
    finite = jnp.sum(terms)
    has_inf = jnp.any((p > 0) & (q <= 0))
    return jnp.where(has_inf, jnp.inf, finite)


def bernoulli_kullback_leibler(p, q):
    """KL(B(p) || B(q)) (reference utils.py:89-107)."""
    p = jnp.asarray(p, dtype=jnp.result_type(float))
    q = jnp.asarray(q, dtype=p.dtype)
    kl1 = jnp.where((p > 0) & (q > 0), p * jnp.log(jnp.where(q > 0, p / jnp.where(q > 0, q, 1.0), 1.0)), 0.0)
    # q >= 1 branch: kl2 = inf unless handled below
    log_ratio = jnp.log(jnp.where((p < 1) & (q < 1), (1 - p) / jnp.where(q < 1, 1 - q, 1.0), 1.0))
    kl2 = jnp.where(q < 1, jnp.where(p < 1, (1 - p) * log_ratio, 0.0), jnp.where(p < 1, jnp.inf, 0.0))
    # q == 0 with p > 0 -> kl1 part is p*log(p/0) = inf
    kl1 = jnp.where((p > 0) & (q <= 0), jnp.inf, kl1)
    return kl1 + kl2


def d_bernoulli_kullback_leibler_dq(p, q):
    """dKL/dq (B(p)||B(q)) (reference utils.py:110-120)."""
    return (1 - p) / (1 - q) - p / q


# ---------------------------------------------------------------------------
# Newton / bisection solvers (fixed-capacity, jit/vmap friendly)
# ---------------------------------------------------------------------------

def _bounded_newton_step(x, f_x, df_x, a, b):
    """One guarded Newton step with the reference's out-of-bounds relaxation
    (utils.py:191-195): overshoots are pulled back towards the violated bound."""
    x_next = jnp.where(df_x != 0, x - f_x / df_x, x)
    x_next = jnp.where(jnp.isfinite(x_next), x_next, x)
    w = NEWTON_OOB_WEIGHT
    x_next = jnp.where(x_next < a, w * a + (1 - w) * x, x_next)
    x_next = jnp.where(x_next > b, w * b + (1 - w) * x, x_next)
    return x_next


@partial(jax.jit, static_argnames=("lower",))
def kl_upper_bound(_sum, count, threshold=1.0, eps: float = 1e-2, lower: bool = False):
    """KL-UCB/LCB of an empirical Bernoulli mean (reference utils.py:123-147).

    Solves ``KL(mu, q) = threshold / count`` for q in [mu, 1] (upper) or
    [0, mu] (lower) with a guarded Newton iteration of bounded length.
    jit/vmap-able: pass array ``_sum``/``count``/``threshold`` for batched
    bounds over whole node arenas.
    """
    dtype = jnp.result_type(float)
    _sum = jnp.asarray(_sum, dtype=dtype)
    count = jnp.asarray(count, dtype=dtype)
    threshold = jnp.asarray(threshold, dtype=dtype)
    safe_count = jnp.maximum(count, 1.0)
    mu = _sum / safe_count
    max_div = threshold / safe_count

    a = jnp.where(lower, 0.0, mu)
    b = jnp.where(lower, mu, 1.0)

    def f(q):
        return bernoulli_kullback_leibler(mu, q) - max_div

    def df(q):
        return d_bernoulli_kullback_leibler_dq(mu, q)

    def body(carry):
        x, x_next, it = carry
        x = x_next
        x_next = _bounded_newton_step(x, f(x), df(x), a, b)
        return x, x_next, it + 1

    def cond(carry):
        x, x_next, it = carry
        return (jnp.abs(x - x_next) > eps) & (it < NEWTON_MAX_ITERATIONS)

    x0 = (a + b) / 2
    _, x_next, _ = jax.lax.while_loop(cond, body, (jnp.asarray(jnp.inf, dtype), x0, 0))
    x_next = jnp.clip(x_next, a, b)
    # degenerate interval (mu == bound) and empty-count cases
    x_next = jnp.where(a == b, a, x_next)
    default = jnp.where(lower, 0.0, 1.0).astype(dtype)
    return jnp.where(count == 0, default, x_next)


def newton_iteration(f, df, eps: float, x0=None, a=-jnp.inf, b=jnp.inf,
                     max_iterations: int = NEWTON_MAX_ITERATIONS):
    """Generic guarded Newton solve of f(x)=0 on [a, b] (reference utils.py:150-203).

    ``f``/``df`` must be jnp-traceable scalar functions.
    """
    dtype = jnp.result_type(float)
    a = jnp.asarray(a, dtype)
    b = jnp.asarray(b, dtype)
    if x0 is None:
        x0 = (a + b) / 2
    x0 = jnp.asarray(x0, dtype)

    def body(carry):
        x, x_next, it = carry
        x = x_next
        x_next = _bounded_newton_step(x, f(x), df(x), a, b)
        return x, x_next, it + 1

    def cond(carry):
        x, x_next, it = carry
        return (jnp.abs(x - x_next) > eps) & (it < max_iterations)

    _, x_next, _ = jax.lax.while_loop(cond, body, (jnp.asarray(jnp.inf, dtype), x0, 0))
    x_next = jnp.clip(x_next, a, b)
    return jnp.where(a == b, a, x_next)


def binary_search(f, eps: float, a, b=None, max_iterations: int = 100):
    """Bisection for the zero of a non-increasing function (reference utils.py:206-249).

    When ``b`` is None the upper bound is grown geometrically until bracketing.
    """
    dtype = jnp.result_type(float)
    a = jnp.asarray(a, dtype)
    find_b = b is None
    b = jnp.asarray(a + 1 if b is None else b, dtype)

    def body(carry):
        a, b, grow, x, f_x, it = carry
        x = (a + b) / 2
        f_x = f(x)
        pos_branch = f_x > 0
        new_a = jnp.where(pos_branch, x, a)
        new_b = jnp.where(pos_branch, jnp.where(grow, 2 * jnp.maximum(b, 1.0), b), x)
        new_grow = grow & pos_branch
        return new_a, new_b, new_grow, x, f_x, it + 1

    def cond(carry):
        a, b, grow, x, f_x, it = carry
        return (jnp.abs(f_x) > eps) & (it < max_iterations)

    init = (a, b, jnp.asarray(find_b), jnp.asarray(jnp.nan, dtype), jnp.asarray(jnp.inf, dtype), 0)
    *_, x, _, _ = jax.lax.while_loop(cond, body, init)
    return x


# ---------------------------------------------------------------------------
# Constrained max-expectation (the robust-backup kernel)
# ---------------------------------------------------------------------------

@jax.jit
def max_expectation_under_constraint(f, q, c, eps: float = 1e-2):
    """Solve ``max_p E_p[f]  s.t.  KL(q || p) <= c`` (reference utils.py:292-342).

    Fully vectorised jnp reimplementation of the reference's numba kernels
    (theta_func/d_theta_dl_func/binary_search_theta, utils.py:252-289): all
    data-dependent branches become masks, the Newton solve is a bounded
    while_loop, and the whole solver vmaps over batches of (f, q, c) — the
    per-chance-node Pool parallelism of the reference becomes one XLA kernel.
    """
    dtype = jnp.result_type(float)
    f = jnp.asarray(f, dtype)
    q = jnp.asarray(q, dtype)
    c = jnp.asarray(c, dtype)
    n = q.shape[-1]

    if n == 1:
        # single-atom support: p must put all mass on the sole atom, and
        # KL(q||p) = 0 <= c always — the solver is exactly the identity.
        # Static shape, so this prunes the whole Newton while_loop from the
        # jitted program (it was the dominant sequential chain of stochastic
        # GBOP at max_next_states_count=1; see docs/onehot.md).
        return jnp.ones_like(q)

    all_zero = jnp.all(q == 0)
    q = jnp.where(all_zero, jnp.ones_like(q) / n, q)

    plus = q > 0
    zero = ~plus
    q_p = jnp.where(plus, q, 0.0)
    f_star = jnp.max(f)
    f_p_max = jnp.max(jnp.where(plus, f, -jnp.inf))

    def theta(lam):
        # sum_i q_p log(lam - f_p) + log(sum_i q_p / (lam - f_p)) - c, over plus atoms
        diff = jnp.where(plus, lam - f, 1.0)
        safe = jnp.maximum(diff, 1e-12)
        t1 = jnp.sum(jnp.where(plus, q_p * jnp.log(safe), 0.0))
        s = jnp.sum(jnp.where(plus, q_p / safe, 0.0))
        return t1 + jnp.log(jnp.maximum(s, 1e-300)) - c

    def d_theta(lam):
        diff = jnp.where(plus, lam - f, 1.0)
        safe = jnp.maximum(diff, 1e-12)
        inv = jnp.where(plus, q_p / safe, 0.0)
        s = jnp.sum(inv)
        s2 = jnp.sum(inv / safe)
        return s - s2 / jnp.maximum(s, 1e-300)

    # Case A: the maximum of f is attained only on zero-mass atoms, and moving
    # mass z there saturates the constraint at lambda = f_star.
    theta_star = theta(f_star)
    case_a = (f_star > f_p_max) & (theta_star < 0)
    z = jnp.where(case_a, 1.0 - jnp.exp(theta_star), 0.0)
    zero_max = zero & (f == jnp.max(jnp.where(zero, f, -jnp.inf)))
    zero_max_count = jnp.maximum(jnp.sum(zero_max.astype(dtype)), 1.0)
    p_zero = jnp.where(case_a & zero_max, z / zero_max_count, 0.0)

    # Case B: constant f on the support -> p = q.
    f_p0 = f[jnp.argmax(plus)]  # first positive-mass atom's value
    constant_f = jnp.all(jnp.where(plus, jnp.isclose(f, f_p0), True))

    # Otherwise: solve theta(lambda) = 0 for lambda >= f_star.
    lam_solved = newton_iteration(theta, d_theta, eps, x0=f_star + 1.0, a=f_star, b=jnp.inf)
    lam = jnp.where(case_a, f_star, lam_solved)

    diff = jnp.where(plus, lam - f, 1.0)
    safe = jnp.maximum(diff, 1e-12)
    s = jnp.sum(jnp.where(plus, q_p / safe, 0.0))
    beta = (1.0 - z) / jnp.maximum(s, 1e-300)

    # beta == 0 degenerate fallback: uniform over plus atoms attaining f_star.
    uni = plus & (f == f_star)
    uni_count = jnp.maximum(jnp.sum(uni.astype(dtype)), 1.0)
    p_plus = jnp.where(beta <= 0,
                       jnp.where(uni, (1.0 - z) / uni_count, 0.0),
                       jnp.where(plus, beta * q_p / safe, 0.0))

    p_star = p_plus + p_zero
    return jnp.where(constant_f & ~case_a, q, p_star)


max_expectation_under_constraint_batch = jax.vmap(
    max_expectation_under_constraint, in_axes=(0, 0, 0), out_axes=0
)


# ---------------------------------------------------------------------------
# Batched KL bound convenience (used by OLOP / GBOP / MDP-GapE node arenas)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("lower",))
def kl_bounds_arena(sums, counts, thresholds, lower: bool = False, eps: float = 1e-3):
    """Vectorised KL bound over flat node-stat arrays."""
    fn = jax.vmap(lambda s, n, t: kl_upper_bound(s, n, t, eps=eps, lower=lower))
    return fn(sums, counts, thresholds)
