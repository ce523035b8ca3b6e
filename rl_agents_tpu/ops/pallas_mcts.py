"""Lane-parallel MCTS as a single Pallas TPU kernel (experimental).

NOTE: superseded for throughput by the fused XLA planner
(``agents/tree_search/mcts_fused.py``) — TPUs execute jitted programs fully
on-device, so there is no per-op launch floor to fuse away, and a Pallas
full-search kernel runs its 128-lane blocks sequentially on the TensorCore
while paying O(N) one-hot reductions per tree read. Kept as a validated
exploration of VMEM-resident tree search. This kernel fuses the ENTIRE
search — all episodes, descents, rollouts and backups — into one launch,
with the tree arenas resident in VMEM:

* grid over blocks of LANES=128 trees; each block's tree arrays are shaped
  [nodes, 128] with the *tree index on the lane axis*, so every per-tree
  scalar op is a full-width VPU op;
* per-tree scalars (current node, depth, return, liveness) are kept rank-2
  [1, 128] throughout — Mosaic's vector layouts are 2-D (sublane x lane) and
  rank-1 [128] intermediates in the tree machinery trip an internal layout
  CHECK (layout.h: arr.size() >= layout_rank); the only rank-1 lifetimes are
  at the env-vmap boundary, which lowers fine;
* node-indexed gathers/scatters (child values, backup path updates) become
  one-hot masked reductions/updates over the node (sublane) axis;
* env dynamics run vectorised over lanes via ``jax.vmap(env.transition)``
  inside the kernel (our planning envs are deterministic given actions —
  randomness is only consumed by action sampling, which uses a stateless
  hash RNG);
* data-dependent loops become fixed-trip masked loops (descent/backup are
  bounded by the horizon).

Same algorithm as mcts_plan (UCT selection with uniform priors, rollouts,
mean-value backups); the RNG differs (hash RNG vs threefry), so agreement
with the XLA path is statistical, not bitwise.
"""
from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rl_agents_tpu.envs.base import FunctionalEnv

LANES = 128


def _uniform(shape, seed, ctr):
    """Stateless uniform [0,1): murmur-style hash of (seed, ctr, position).

    Plain integer jnp ops — runs identically on the TPU Mosaic backend and in
    interpret mode (the pltpu PRNG primitives are TPU-only)."""
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    x = (i * jnp.uint32(2654435761) ^ (j + jnp.uint32(0x9E3779B9))) \
        + seed.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B) \
        + ctr.astype(jnp.uint32) * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x2C1B3C6D)
    x = x ^ (x >> 12)
    x = x * jnp.uint32(0x297A2D39)
    x = x ^ (x >> 15)
    # Mosaic has no uint32->float cast; go through int32 (value < 2^24)
    return (x >> 8).astype(jnp.int32).astype(jnp.float32) / jnp.float32(1 << 24)


def _one_hot_nodes(idx, n_nodes):
    """[N, LANES] mask with True at (idx[lane], lane); idx is [1, LANES]."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_nodes, LANES), 0)
    return rows == idx


def _mask_tree(mask_row, new, old):
    """Per-lane select broadcast over a state leaf, as arithmetic blending —
    Mosaic cannot broadcast/insert sub-32-bit (bool) values along minor dims,
    so the mask is widened to a 32-bit type before broadcasting. ``mask_row``
    is [1, LANES]; state leaves carry the lane axis FIRST."""
    lanes = mask_row.reshape((LANES,))
    if new.dtype == jnp.bool_:
        m = lanes.astype(jnp.int32).reshape((LANES,) + (1,) * (new.ndim - 1))
        blended = new.astype(jnp.int32) * m + old.astype(jnp.int32) * (1 - m)
        return blended != 0
    m = lanes.astype(new.dtype).reshape((LANES,) + (1,) * (new.ndim - 1))
    return new * m + old * (1 - m)


def _read_nodes(arr, idx):
    """arr[N, LANES] gathered at per-lane node index [1, LANES] -> [1, LANES]."""
    oh = _one_hot_nodes(idx, arr.shape[0])
    return jnp.sum(jnp.where(oh, arr, jnp.zeros((), arr.dtype)), axis=0,
                   keepdims=True)


def _cat(rows):
    """[1, LANES] rows -> [len(rows), LANES]."""
    return jnp.concatenate(rows, axis=0)


def make_mcts_kernel(env: FunctionalEnv, example_state, num_actions: int,
                     episodes: int, horizon: int, gamma: float, temperature: float,
                     interpret: bool = False):
    """Build ``plan(states0, seeds) -> root actions [B]`` running fully in one
    Pallas kernel per 128-tree block."""
    A, H = num_actions, horizon
    N = 1 + episodes * A
    gammaf = float(gamma)
    # env params enter the kernel as inputs (pallas kernels cannot capture
    # constants); scalars are reshaped to (1,) SMEM-friendly arrays
    params0 = env.default_params()
    flat_params, params_def = jax.tree.flatten(params0)
    flat_params = [jnp.atleast_1d(jnp.asarray(p)) for p in flat_params]
    param_scalar = [jax.tree.leaves(params0)[i].ndim == 0 for i in range(len(flat_params))]
    flat_example, treedef = jax.tree.flatten(example_state)
    n_params = len(flat_params)

    def step_lanes(params, states, actions_row):
        """Vectorised env step; ``actions_row`` is [1, LANES]. Outputs are
        reshaped back to [1, LANES] immediately (rank-1 only inside vmap)."""
        zero_key = jnp.zeros((2,), jnp.uint32)
        outs = jax.vmap(lambda s, a: env.transition(params, s, a, zero_key),
                        in_axes=(0, 0))(states, actions_row.reshape((LANES,)))
        return (outs.state,
                outs.reward.reshape((1, LANES)),
                outs.terminated.reshape((1, LANES)))

    def kernel(seed_ref, *refs):
        param_refs = refs[:n_params]
        state_refs, out_ref = refs[n_params:-1], refs[-1]
        seed = seed_ref[pl.program_id(0)]
        params = jax.tree.unflatten(params_def, [
            r[0] if scalar else r[:]
            for r, scalar in zip(param_refs, param_scalar)])
        state0 = jax.tree.unflatten(treedef, [r[:] for r in state_refs])

        def episode(ep, carry):
            children, count, value, parent = carry

            # ---- descend (fixed H, live-masked) ---------------------------
            def descend_step(h, c):
                node, state, depth, total, terminal, live = c
                ch = _cat([_read_nodes(children[a], node) for a in range(A)])
                has_children = ch[0:1] >= 0
                live_now = live & has_children & ~terminal
                chs = jnp.maximum(ch, 0).astype(jnp.int32)
                vals = _cat([_read_nodes(value, chs[a:a + 1]) for a in range(A)])
                cnts = _cat([_read_nodes(count, chs[a:a + 1]) for a in range(A)])
                scores = vals + temperature / (cnts + 1.0)  # uniform priors
                scores = scores + 1e-5 * _uniform((A, LANES), seed, ep * 1024 + h)
                action = jnp.argmax(scores, axis=0, keepdims=True).astype(jnp.int32)
                new_state, reward, terminated = step_lanes(params, state, action)
                sel = jax.lax.broadcasted_iota(jnp.int32, (A, LANES), 0) == action
                new_node = jnp.sum(jnp.where(sel, ch, 0), axis=0,
                                   keepdims=True).astype(jnp.int32)
                node = jnp.where(live_now, new_node, node)
                state = jax.tree.map(
                    lambda old, new: _mask_tree(live_now, new, old), state, new_state)
                total = total + jnp.where(live_now, gammaf ** depth * reward, 0.0)
                depth = depth + live_now.astype(jnp.float32)
                terminal = terminal | (live_now & terminated)
                return node, state, depth, total, terminal, live_now

            node, state, depth, total, terminal, _ = jax.lax.fori_loop(
                0, H, descend_step,
                (jnp.zeros((1, LANES), jnp.int32), state0, jnp.zeros((1, LANES)),
                 jnp.zeros((1, LANES)), jnp.zeros((1, LANES), bool),
                 jnp.ones((1, LANES), bool)))

            # ---- expand ---------------------------------------------------
            ch0 = _read_nodes(children[0], node)
            do_expand = (ch0 < 0) & (depth < H) & (~terminal | (node == 0))
            base = 1 + ep * A
            rows = jax.lax.broadcasted_iota(jnp.int32, (N, LANES), 0)
            node_oh = _one_hot_nodes(node, N) & do_expand
            new_children = []
            for a in range(A):
                new_children.append(jnp.where(node_oh, base + a, children[a]))
                child_row = (rows == base + a) & do_expand
                parent = jnp.where(child_row, node, parent)
            children = new_children

            # ---- rollout --------------------------------------------------
            def rollout_step(h, c):
                state, hh, total, terminal = c
                u = _uniform((1, LANES), seed, ep * 2048 + 512 + h)
                action = jnp.minimum((u * A).astype(jnp.int32), A - 1)
                new_state, reward, terminated = step_lanes(params, state, action)
                live = (hh < H) & ~terminal
                total = total + jnp.where(live, gammaf ** hh * reward, 0.0)
                state = jax.tree.map(
                    lambda old, new: _mask_tree(live, new, old), state, new_state)
                terminal = terminal | (live & terminated)
                return state, hh + 1.0, total, terminal

            _, _, rolled, _ = jax.lax.fori_loop(
                0, H, rollout_step, (state, depth, total, terminal))
            total = jnp.where(terminal, total, rolled)

            # ---- backup (walk parents; <= H+1 live steps) -----------------
            def backup_step(h, c):
                count, value, node, live = c
                oh = _one_hot_nodes(node, N) & live
                count = jnp.where(oh, count + 1.0, count)
                cnt_here = _read_nodes(count, node)
                val_here = _read_nodes(value, node)
                new_val = val_here + (total - val_here) / jnp.maximum(cnt_here, 1.0)
                value = jnp.where(oh, new_val, value)
                up = _read_nodes(parent, node).astype(jnp.int32)
                live = live & (node != 0)
                return count, value, jnp.where(live, up, node), live

            count, value, _, _ = jax.lax.fori_loop(
                0, H + 1, backup_step,
                (count, value, node, jnp.ones((1, LANES), bool)))
            return children, count, value, parent

        children0 = [jnp.full((N, LANES), -1, jnp.int32) for _ in range(A)]
        children, count, value, parent = jax.lax.fori_loop(
            0, episodes, episode,
            (children0, jnp.zeros((N, LANES)), jnp.zeros((N, LANES)),
             jnp.zeros((N, LANES), jnp.int32)))

        # ---- root recommendation: max count, ties by value ----------------
        root = jnp.zeros((1, LANES), jnp.int32)
        ch = _cat([_read_nodes(children[a], root) for a in range(A)])
        chs = jnp.maximum(ch, 0).astype(jnp.int32)
        cnts = _cat([_read_nodes(count, chs[a:a + 1]) for a in range(A)])
        vals = _cat([_read_nodes(value, chs[a:a + 1]) for a in range(A)])
        best = jnp.max(cnts, axis=0, keepdims=True)
        score = jnp.where(cnts == best, vals, -jnp.inf)
        out_ref[:, :] = jnp.argmax(score, axis=0, keepdims=True).astype(jnp.int32)

    def plan(states0, seeds):
        flat_states = jax.tree.leaves(states0)
        B = flat_states[0].shape[0]
        assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
        grid = (B // LANES,)

        n_blocks = B // LANES
        # per-block seeds live whole in SMEM; the kernel indexes by program_id
        in_specs = [pl.BlockSpec((n_blocks,), lambda i: (0,), memory_space=pltpu.SMEM)]
        for p, scalar in zip(flat_params, param_scalar):
            # single-element VMEM blocks trip Mosaic's vector-layout CHECK
            # (layout.h: arr.size() >= layout_rank); scalars go to SMEM
            in_specs.append(pl.BlockSpec(
                p.shape, (lambda nd: (lambda i: (0,) * nd))(p.ndim),
                memory_space=pltpu.SMEM if scalar else pltpu.VMEM))
        for x in flat_states:
            ndim = x.ndim
            block = (LANES,) + tuple(x.shape[1:])
            in_specs.append(pl.BlockSpec(
                block, (lambda nd: (lambda i: (i,) + (0,) * (nd - 1)))(ndim),
                memory_space=pltpu.VMEM))

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, LANES), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, B), jnp.int32),
            interpret=interpret,
        )(seeds.astype(jnp.int32)[:n_blocks], *flat_params, *flat_states)
        return out.reshape((B,))

    return plan, N
