"""Dense one-hot row gather/scatter for node-major [N, B] arenas.

On TPU, advanced indexing with a batch-varying row per lane
(``arr[idx, iota]`` / ``arr.at[idx, iota].set(v)``) lowers to per-lane
gather/scatter ops that cost tens of milliseconds per call on [N, B]
arenas at B=4096 — measured as the dominant cost of the fused batch
planners (the r2 bench put OPD at 0.4% of HBM roofline). The
memory-speed alternative is a dense one-hot mask over the node axis:
a gather becomes ``sum(where(onehot, arr, 0), axis=0)`` and a scatter
``where(onehot, value, arr)`` — full-array VPU streams XLA fuses freely.
Both are EXACT (the mask selects a single row per lane; no float
summation error is introduced because all other addends are zero).

Cost model: one gather/scatter reads (and for scatter, rewrites) the
whole [N, B, ...] arena — at HBM bandwidth that is microseconds, versus
the pathological per-lane lowering's milliseconds. Worth it whenever
N is budget-bounded (every planner arena here).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def row_onehot(idx, n: int):
    """[B] row indices -> [n, B] bool mask, True at (idx[b], b)."""
    return jnp.arange(n, dtype=idx.dtype)[:, None] == idx[None, :]


def _expand_mask(mask, arr):
    while mask.ndim < arr.ndim:
        mask = mask[..., None]
    return mask


def gather_rows(arr, onehot):
    """Per-lane row gather: arr [N, B, ...] x onehot [N, B] -> [B, ...]."""
    m = _expand_mask(onehot, arr)
    if arr.dtype == jnp.bool_:
        return jnp.any(m & arr, axis=0)
    return jnp.sum(jnp.where(m, arr, jnp.zeros((), arr.dtype)), axis=0)


def gather_rows_tree(tree, onehot):
    """``gather_rows`` over every leaf of a pytree of [N, B, ...] arenas."""
    return jax.tree.map(lambda x: gather_rows(x, onehot), tree)


def scatter_rows(arr, onehot, value):
    """Per-lane row scatter: write value [B, ...] (or scalar) at each lane's
    masked row of arr [N, B, ...]."""
    value = jnp.asarray(value, arr.dtype)
    if value.ndim:
        value = value[None]
    return jnp.where(_expand_mask(onehot, arr), value, arr)


# -- scalar-index variants for single-tree programs -------------------------
# Inside a per-tree program the index is a scalar; these lower to dense [n]
# streams that ``vmap`` turns into the fast batched [B, n] form — so a
# planner written with them gets the one-hot speedup for free when vmapped
# over a tree batch (the advanced-indexing form becomes a per-lane
# gather/scatter instead, the TPU pathology).

def onehot(idx, n: int):
    """Scalar row index -> [n] bool mask (vmaps to [B, n])."""
    return jnp.arange(n, dtype=jnp.int32) == idx


def select_row(arr, mask):
    """arr [N, ...] x mask [N] -> arr[idx] as a dense masked reduction."""
    m = _expand_mask(mask, arr)
    if arr.dtype == jnp.bool_:
        return jnp.any(m & arr, axis=0)
    return jnp.sum(jnp.where(m, arr, jnp.zeros((), arr.dtype)), axis=0)


def select_row_tree(tree, mask):
    return jax.tree.map(lambda x: select_row(x, mask), tree)


def set_row(arr, mask, value):
    """arr [N, ...] with arr[idx] <- value, as a dense masked blend."""
    value = jnp.asarray(value, arr.dtype)
    return jnp.where(_expand_mask(mask, arr), value, arr)


def select_action_values(q, actions):
    """Per-row Q-value select ``q[i, actions[i]]`` as a one-hot masked sum.

    ``jnp.take_along_axis(q, a[:, None], 1)`` is a per-lane gather — measured
    at 70% of a whole bf16 EgoAttention DQN update on the v5e (2.08 ms ->
    0.65 ms at batch 4096 after this substitution; docs/onehot.md). Exact:
    one term of the sum is hot per row."""
    A = q.shape[-1]
    return jnp.sum(q * (actions[..., None] == jnp.arange(A)), axis=-1)
