"""Pallas TPU kernel for batched KL-UCB/LCB Newton solves.

The guarded-Newton Bernoulli-KL bound (utils/math.py:152-194, rebuilt from
reference rl_agents/utils.py:123-147 + numba kernels :252-289) is evaluated
for every node of every tree arena on each OLOP / GBOP / MDP-GapE episode —
the largest purely-elementwise hot op in the planner family. This kernel
runs the whole solve in VMEM as one fused pass over (rows, 128)-lane tiles:
inputs are loaded once, all ``ITERS`` Newton steps happen in registers/VMEM,
and the bound is stored once — no intermediate HBM round-trips.

Semantics: identical math to ``utils.math.kl_upper_bound`` with per-element
convergence *freezing* (an element stops moving once its own |dx| <= eps),
which is the reference's scalar stopping rule. The XLA path under vmap
instead iterates every lane until the whole batch converges; both land
within the Newton tolerance of each other, so parity tests use ``eps``-level
tolerances, not bit equality.

Compiles with Mosaic on real TPU hardware (elementwise f32 on rank-2 tiles;
fixed-trip fori_loop). Interpret mode covers CPU test runs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rl_agents_tpu.utils.math import (
    NEWTON_OOB_WEIGHT,
    bernoulli_kullback_leibler,
    d_bernoulli_kullback_leibler_dq,
)

LANES = 128
TILE_ROWS = 256  # 256x128 f32 tiles: 128 KiB per operand, 4 operands << VMEM


def _kl_bound_kernel(sum_ref, count_ref, thr_ref, out_ref, *, lower: bool,
                     iters: int, eps: float):
    s = sum_ref[:]
    n = count_ref[:]
    thr = thr_ref[:]
    safe = jnp.maximum(n, 1.0)
    mu = s / safe
    max_div = thr / safe
    a = jnp.zeros_like(mu) if lower else mu
    b = mu if lower else jnp.ones_like(mu)

    w = NEWTON_OOB_WEIGHT
    x0 = (a + b) / 2

    def body(_, carry):
        # frozen is an f32 0/1 mask: Mosaic's scf.for legalization rejects
        # carried i1 vectors, so the convergence state stays in float
        x, frozen = carry
        f_x = bernoulli_kullback_leibler(mu, x) - max_div
        df_x = d_bernoulli_kullback_leibler_dq(mu, x)
        x_next = jnp.where(df_x != 0, x - f_x / df_x, x)
        x_next = jnp.where(jnp.isfinite(x_next), x_next, x)
        x_next = jnp.where(x_next < a, w * a + (1 - w) * x, x_next)
        x_next = jnp.where(x_next > b, w * b + (1 - w) * x, x_next)
        frozen_next = jnp.maximum(
            frozen, (jnp.abs(x_next - x) <= eps).astype(jnp.float32))
        return jnp.where(frozen > 0, x, x_next), frozen_next

    x, _ = jax.lax.fori_loop(0, iters, body, (x0, jnp.zeros_like(mu)))
    x = jnp.clip(x, a, b)
    x = jnp.where(a == b, a, x)
    default = 0.0 if lower else 1.0
    out_ref[:] = jnp.where(n == 0, default, x)


@partial(jax.jit, static_argnames=("lower", "iters", "interpret"))
def kl_bound_pallas(_sum, count, threshold, lower: bool = False,
                    iters: int = 24, eps: float = 1e-2,
                    interpret: bool = False):
    """Batched KL-UCB (or LCB with ``lower=True``) of empirical Bernoulli
    means; drop-in for ``utils.math.kl_upper_bound`` on float32 arrays of any
    shape. Inputs broadcast against each other."""
    _sum, count, threshold = jnp.broadcast_arrays(
        jnp.asarray(_sum, jnp.float32), jnp.asarray(count, jnp.float32),
        jnp.asarray(threshold, jnp.float32))
    shape = _sum.shape
    size = _sum.size
    tile = TILE_ROWS * LANES
    rows = max(-(-size // LANES), 8)
    rows = -(-rows // 8) * 8  # sublane alignment
    padded = rows * LANES

    def prep(x):
        flat = jnp.ravel(x)
        flat = jnp.pad(flat, (0, padded - size))
        return flat.reshape(rows, LANES)

    block_rows = min(rows, TILE_ROWS)
    grid = -(-rows // block_rows)
    spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kl_bound_kernel, lower=lower, iters=iters, eps=eps),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        grid=(grid,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(prep(_sum), prep(count), prep(threshold))
    return out.reshape(-1)[:size].reshape(shape)
