"""Exact-rounding helpers for the parity planners.

XLA:CPU lets LLVM contract mul+add chains into single-rounding FMAs
(unconditionally — ``--xla_allow_excess_precision=false`` does not reach the
LLVM contraction, and ``optimization_barrier``/bitcast round-trips are folded
away before instruction selection). The reference computes in python floats,
i.e. one IEEE rounding per operation. Computing a product inside a
``lax.cond`` branch is the one construct measured to survive codegen as a
separate computation, forcing the product to round before any consuming add.

These helpers are for parity paths only (correctness over speed); the
performance planners use plain jnp arithmetic.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_mul(b, c):
    """``b * c`` rounded and materialized as its own computation, so a
    consuming add/sub cannot be contracted into an FMA. Both cond branches
    are identical; the predicate value is irrelevant."""
    return jax.lax.cond(jnp.isfinite(b), lambda: b * c, lambda: b * c)


def mul_add_exact(a, b, c):
    """``a + b * c`` with two separate IEEE roundings (python semantics)."""
    return a + exact_mul(b, c)


def kl_upper_bound_exact(_sum, count, threshold, eps: float = 1e-2):
    """Reference-structured KL-UCB: the same Newton iteration as the
    reference's ``kl_upper_bound`` (reference: rl_agents/utils.py:123-203) —
    identical stopping rule (``|x - x_next| > eps``, max 100 iterations),
    identical bound handling (weighted pull-back with weight 0.9, final
    clamp), identical branch structure of ``bernoulli_kullback_leibler`` —
    in float64 with FMA-protected products.

    Bitwise caveat: XLA's float64 ``log`` differs from numpy's libm by 1 ULP
    on ~0.1% of inputs, so iterates can drift in the last bits; trajectories
    and tie-breaks still match because cross-side comparisons only flip on
    sub-2-ULP gaps, which structurally tied subtrees produce identically on
    each side. Parity tests assert exact plans + ~1e-12 value agreement.
    """
    f64 = jnp.float64
    mu = _sum / count.astype(f64)
    max_div = threshold / count.astype(f64)
    a, b = mu, f64(1.0)
    weight, one_minus_weight = 0.9, 1.0 - 0.9

    def kl_f(q):
        p = mu
        kl1 = jnp.where((p > 0) & (q > 0), exact_mul(p, jnp.log(p / q)), 0.0)
        kl2 = jnp.where(q < 1,
                        jnp.where(p < 1,
                                  exact_mul(1 - p, jnp.log((1 - p) / (1 - q))),
                                  0.0),
                        jnp.inf)
        return (kl1 + kl2) - max_div

    def dkl_f(q):
        p = mu
        return (1 - p) / (1 - q) - p / q

    def cond(c):
        x, x_next, it = c
        return (jnp.abs(x - x_next) > eps) & (it < 100)

    def body(c):
        _, x, it = c
        f_x = kl_f(x)
        df_x = dkl_f(x)
        x_next = jnp.where(df_x != 0, x - f_x / df_x, x)
        below = x_next < a
        pulled_a = exact_mul(f64(weight), a) + exact_mul(f64(one_minus_weight), x)
        pulled_b = exact_mul(f64(weight), b) + exact_mul(f64(one_minus_weight), x)
        x_next = jnp.where(below, pulled_a,
                           jnp.where(x_next > b, pulled_b, x_next))
        return x, x_next, it + 1

    x0 = (a + b) / 2
    _, x_next, _ = jax.lax.while_loop(
        cond, body, (f64(jnp.inf), x0, jnp.zeros((), jnp.int32)))
    x_next = jnp.where(x_next < a, a, jnp.where(x_next > b, b, x_next))
    return jnp.where(count == 0, f64(1.0), jnp.where(a == b, a, x_next))
