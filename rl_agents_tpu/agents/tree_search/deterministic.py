"""Optimistic Planning for Deterministic systems (OPD), array-encoded.

Rebuild of the reference planner (tree_search/deterministic.py:9-139). The
reference's Python object tree with one env deep-copy per child
(deterministic.py:28-43, its dominant cost) becomes a fixed-capacity node
arena in device arrays plus a stacked env-state pytree; one expansion round =
masked argmax leaf selection + a vmapped env step over all actions + a
bounded backup walk. The whole ``plan`` is a single jitted program, and
``plan_batch`` vmaps it over thousands of trees (BASELINE config 4).

Bound math preserved exactly (deterministic.py:45-62):
    value_lower(child) = value_lower(parent) + gamma^(d-1) * r
    value_upper(child) = value_lower(child) + gamma^d / (1 - gamma)
    terminal children: both collapse to value_lower + terminal_reward * gamma^d/(1-gamma)
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.common import (
    AbstractTreeSearchAgent,
    arena_subtree_gather,
)
from rl_agents_tpu.envs.base import FunctionalEnv


class OPDTree(NamedTuple):
    parent: Any        # [N] i32
    action: Any        # [N] i32 action from parent
    depth: Any         # [N] i32
    children: Any      # [N, A] i32, -1 when absent
    reward: Any        # [N] f32
    done: Any          # [N] bool
    value_lower: Any   # [N] f32
    value_upper: Any   # [N] f32
    leaf: Any          # [N] bool: allocated and unexpanded
    count: Any         # [N] i32 subtree visit counts
    used: Any          # [] i32 allocated node count
    states: Any        # env-state pytree stacked on a leading N axis


def _init_tree(env: FunctionalEnv, state0, capacity: int, num_actions: int) -> OPDTree:
    N, A = capacity, num_actions
    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), state0)
    return OPDTree(
        parent=jnp.full((N,), -1, jnp.int32),
        action=jnp.full((N,), -1, jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        reward=jnp.zeros((N,), jnp.float32),
        done=jnp.zeros((N,), bool),
        value_lower=jnp.zeros((N,), jnp.float32),
        value_upper=jnp.zeros((N,), jnp.float32),
        leaf=jnp.zeros((N,), bool).at[0].set(True),
        count=jnp.zeros((N,), jnp.int32).at[0].set(1),
        used=jnp.ones((), jnp.int32),
        states=states,
    )


def _expand(env: FunctionalEnv, params, tree: OPDTree, leaf_idx, base, gamma,
            terminal_reward, num_actions: int) -> OPDTree:
    """Expand a leaf: step the env once per action (vmapped), write child
    stats (reference: deterministic.py:28-65).

    ``base`` is the round-indexed slot base — the SAME value for every tree
    in a vmapped batch. This matters enormously on TPU: a vmapped
    dynamic_update_slice with a per-tree start (the old ``tree.used``
    cursor) lowers to a per-lane scatter costing ~20 ms/round/field on the
    state arena at B=4096, while a batch-invariant start is a single cheap
    slice update (measured; see docs/pallas.md's sibling lesson — keep
    batch-varying dynamic indexing off the hot path)."""
    A = num_actions
    child_ids = base + jnp.arange(A, dtype=jnp.int32)
    leaf_state = jax.tree.map(lambda x: x[leaf_idx], tree.states)
    actions = jnp.arange(A)
    keys = jnp.zeros((A, 2), jnp.uint32)  # deterministic planner: null keys
    outs = jax.vmap(env.transition, in_axes=(None, None, 0, 0))(params, leaf_state, actions, keys)

    d = tree.depth[leaf_idx] + 1
    reward = outs.reward.astype(jnp.float32)
    done = outs.terminated | tree.done[leaf_idx]
    vl = tree.value_lower[leaf_idx] + gamma ** (d - 1).astype(jnp.float32) * reward
    vu = vl + gamma ** d.astype(jnp.float32) / (1 - gamma)
    terminal_value = vl + terminal_reward * gamma ** d.astype(jnp.float32) / (1 - gamma)
    vl = jnp.where(done, terminal_value, vl)
    vu = jnp.where(done, terminal_value, vu)

    states = jax.tree.map(
        lambda arena, new: jax.lax.dynamic_update_slice_in_dim(arena, new, base, axis=0),
        tree.states, outs.state)

    # ancestor count bumps and interior bound backups are deferred to the
    # single consolidation sweep in _finalize_bounds
    count = tree.count.at[child_ids].set(1)

    return tree._replace(
        parent=tree.parent.at[child_ids].set(leaf_idx),
        action=tree.action.at[child_ids].set(actions),
        depth=tree.depth.at[child_ids].set(d),
        children=tree.children.at[leaf_idx].set(child_ids),
        reward=tree.reward.at[child_ids].set(reward),
        done=tree.done.at[child_ids].set(done),
        value_lower=tree.value_lower.at[child_ids].set(vl),
        value_upper=tree.value_upper.at[child_ids].set(vu),
        leaf=tree.leaf.at[leaf_idx].set(False).at[child_ids].set(True),
        count=count,
        used=tree.used + A,
        states=states,
    )


def _greedy_plan(tree: OPDTree, key, plan_capacity: int):
    """Greedy descent by value_lower with random tie-breaking
    (reference: deterministic.py:21-26, abstract.py:143-156)."""

    def body(carry, _):
        node, key, live = carry
        ch = tree.children[node]
        valid = ch >= 0
        has_children = jnp.any(valid)
        vals = jnp.where(valid, tree.value_lower[jnp.maximum(ch, 0)], -jnp.inf)
        m = jnp.max(vals)
        ties = valid & (vals == m)
        key, sub = jax.random.split(key)
        action = jax.random.categorical(sub, jnp.where(ties, 0.0, -jnp.inf))
        emit = live & has_children
        next_node = jnp.where(emit, ch[action], node)
        return (next_node, key, emit), jnp.where(emit, action, -1)

    (_, _, _), actions = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), key, jnp.asarray(True)), None, length=plan_capacity)
    length = jnp.sum(actions >= 0)
    return actions, length


def _greedy_plan_pcg64(tree: OPDTree, stream, inc, plan_capacity: int):
    """Greedy descent with the reference's exact RNG: ties by equality
    (Node.all_argmax, abstract.py:295-301) broken by ``np_random.choice``
    (abstract.py:303-311) on a device PCG64 stream that reproduces numpy
    bit-for-bit (utils/pcg64.py). A single-element choice consumes no draw
    (numpy's rng==0 early-out), so draw consumption matches the reference's
    get_plan descent (abstract.py:143-156) one-to-one."""
    from rl_agents_tpu.utils.pcg64 import pcg64_choice

    def body(carry, _):
        node, stream, live = carry
        ch = tree.children[node]
        valid = ch >= 0
        has_children = jnp.any(valid)
        vals = jnp.where(valid, tree.value_lower[jnp.maximum(ch, 0)], -jnp.inf)
        m = jnp.max(vals)
        ties = valid & (vals == m)
        k = jnp.sum(ties).astype(jnp.uint32)
        emit = live & has_children
        stream2, idx = pcg64_choice(stream, inc, jnp.where(emit, k, jnp.uint32(0)))
        stream = jax.tree.map(lambda a, b: jnp.where(emit, a, b), stream2, stream)
        pos = jnp.cumsum(ties.astype(jnp.int32)) - 1
        action = jnp.argmax(ties & (pos == idx.astype(jnp.int32)))
        next_node = jnp.where(emit, ch[action], node)
        return (next_node, stream, emit), jnp.where(emit, action, -1)

    (_, stream, _), actions = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), stream, jnp.asarray(True)), None,
        length=plan_capacity)
    length = jnp.sum(actions >= 0)
    return actions, length, stream


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions", "plan_capacity"))
def opd_plan_parity(env: FunctionalEnv, params, state0, stream, inc, num_actions: int,
                    expansions: int, gamma: float, terminal_reward: float = 0.0,
                    plan_capacity: int = 32):
    """opd_plan with reference-exact RNG: identical expansions (deterministic,
    insertion-ordered leaf max) AND identical tie-broken plan extraction at a
    fixed seed — bit-exact trajectories vs the reference (BASELINE.md north
    star). ``stream, inc = pcg64_init(seed)`` mirrors the reference's
    ``planner.seed(seed)`` (gymnasium np_random -> Generator(PCG64(seed)))."""
    capacity = 1 + expansions * num_actions
    tree = _init_tree(env, state0, capacity, num_actions)
    gamma = jnp.float32(gamma)
    terminal_reward = jnp.float32(terminal_reward)
    tree = _expansion_rounds(env, params, tree, expansions, gamma, terminal_reward, num_actions)
    actions, length, stream = _greedy_plan_pcg64(tree, stream, inc, plan_capacity)
    return actions, length, tree, stream


def _expansion_rounds(env, params, tree, expansions, gamma, terminal_reward,
                      num_actions, base0: int = 1):
    """``expansions`` rounds of [select optimistic leaf -> expand], then ONE
    bottom-up consolidation. OPD's expansion rule reads only LEAF upper
    bounds (reference deterministic.py:106-114: ``max(leaves, ...)``), and
    interior bounds are nested maxes whose fixed point is order-independent
    (f32 max is exact) — so the reference's per-expansion backup walk
    (deterministic.py:74-79), a serial parent chain per round, is deferred
    into a single vectorized sweep pass with identical resulting bounds."""
    def round_fn(i, tree):
        scores = jnp.where(tree.leaf, tree.value_upper, -jnp.inf)
        leaf_idx = jnp.argmax(scores)  # first max == earliest-created leaf,
        # matching the reference's insertion-ordered max() tie-break
        base = base0 + i * num_actions  # round-indexed slots, batch-invariant
        return _expand(env, params, tree, leaf_idx, base, gamma, terminal_reward,
                       num_actions)

    tree = jax.lax.fori_loop(0, expansions, round_fn, tree)
    return _finalize_bounds(tree, max_sweeps=expansions + 1)


def _finalize_bounds(tree: OPDTree, max_sweeps: int) -> OPDTree:
    """Bottom-up fixed point of interior bounds (max over children) and
    subtree counts (1 + sum over children — the closed form of the
    reference's per-expansion +A ancestor bumps, Node.update -> sequence()).
    Early-exits once a sweep changes nothing (~tree depth sweeps)."""
    cvalid = tree.children >= 0
    cidx = jnp.maximum(tree.children, 0)
    interior = jnp.any(cvalid, axis=1)

    def cond(carry):
        i, _, _, _, changed = carry
        return (i < max_sweeps) & changed

    def body(carry):
        i, vl, vu, cnt, _ = carry
        cl = jnp.max(jnp.where(cvalid, vl[cidx], -jnp.inf), axis=1)
        cu = jnp.max(jnp.where(cvalid, vu[cidx], -jnp.inf), axis=1)
        cc = 1 + jnp.sum(jnp.where(cvalid, cnt[cidx], 0), axis=1)
        nvl = jnp.where(interior, cl, vl)
        nvu = jnp.where(interior, cu, vu)
        ncnt = jnp.where(interior, cc, cnt)
        changed = jnp.any((nvl != vl) | (nvu != vu) | (ncnt != cnt))
        return i + 1, nvl, nvu, ncnt, changed

    _, vl, vu, cnt, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), tree.value_lower, tree.value_upper, tree.count, jnp.bool_(True)))
    return tree._replace(value_lower=vl, value_upper=vu, count=cnt)


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions", "plan_capacity"))
def opd_plan(env: FunctionalEnv, params, state0, key, num_actions: int, expansions: int,
             gamma: float, terminal_reward: float = 0.0, plan_capacity: int = 32):
    """Full OPD plan as one device program (reference: deterministic.py:106-122):
    ``expansions`` rounds of [select optimistic leaf -> expand -> backup]."""
    capacity = 1 + expansions * num_actions
    tree = _init_tree(env, state0, capacity, num_actions)
    gamma = jnp.float32(gamma)
    terminal_reward = jnp.float32(terminal_reward)
    tree = _expansion_rounds(env, params, tree, expansions, gamma, terminal_reward, num_actions)
    actions, length = _greedy_plan(tree, key, plan_capacity)
    return actions, length, tree


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions", "plan_capacity"))
def opd_plan_continue(env: FunctionalEnv, params, tree: OPDTree, state0, key,
                      num_actions: int, expansions: int, gamma: float,
                      terminal_reward: float = 0.0, plan_capacity: int = 32):
    """Continue planning in a carried (re-rooted) arena: ``expansions`` more
    rounds, exactly the reference's ``plan`` on a stepped tree
    (deterministic.py:116-122 after step_by_subtree). The arena's LAST
    ``expansions * num_actions`` slots must be unallocated padding
    (opd_grow_arena provides them); new children go there at round-indexed
    bases shared across the vmapped batch — per-tree allocation cursors are
    a TPU scatter pathology (see _expand). The root state is refreshed from
    the current env (deterministic.py:117 ``self.root.state = state``)."""
    gamma = jnp.float32(gamma)
    terminal_reward = jnp.float32(terminal_reward)
    capacity = tree.parent.shape[0]
    base0 = capacity - expansions * num_actions
    tree = tree._replace(states=jax.tree.map(
        lambda arena, x: arena.at[0].set(x), tree.states, state0))
    tree = _expansion_rounds(env, params, tree, expansions, gamma, terminal_reward,
                             num_actions, base0=base0)
    actions, length = _greedy_plan(tree, key, plan_capacity)
    return actions, length, tree


@partial(jax.jit, static_argnames=("num_actions", "out_capacity", "backup_sweeps"))
def opd_step_subtree(tree: OPDTree, action, gamma: float, num_actions: int,
                     out_capacity: int, backup_sweeps: int = 64):
    """Re-root the arena at the root's child for ``action``
    (reference: abstract.py:194-206 step_by_subtree + deterministic.py:124-132).

    The reference moves a root pointer and rescales every leaf's bounds by
    (v - r0) / gamma, then re-backs-up. Here the subtree is *compacted* into a
    fresh arena with a stable gather (see ``arena_subtree_gather``).
    Truncation has no reference analog (its trees grow without bound); nodes
    re-leafed by truncation get their optimistic leaf bound restored, and a
    bounded bottom-up sweep recomputes interior bounds.

    Returns ``(new_tree, valid)``; ``valid=False`` means the action was never
    explored and the caller must plan from scratch (abstract.py:203-206).
    """
    A = num_actions
    gamma = jnp.float32(gamma)
    new_root = tree.children[0, action]
    old_of_new, new_id, used, slot, valid = arena_subtree_gather(
        tree.parent, tree.children, tree.used, action, out_capacity)

    def take(x, fill):
        return jnp.where(slot if x.ndim == 1 else slot[:, None], x[old_of_new], fill)

    parent = take(new_id[jnp.maximum(tree.parent, 0)], -1)
    parent = parent.at[0].set(-1)  # the new root
    children = take(jnp.where(tree.children >= 0, new_id[jnp.maximum(tree.children, 0)], -1), -1)
    depth = take(tree.depth - 1, 0)
    reward = take(tree.reward, 0.0)
    done = take(tree.done, False)
    count = take(tree.count, 0)
    act = take(tree.action, -1)

    # Bound rescale (deterministic.py:129-131): v' = (v - r0) / gamma.
    r0 = tree.reward[new_root]
    vl = take((tree.value_lower - r0) / gamma, 0.0)
    vu = take((tree.value_upper - r0) / gamma, 0.0)

    was_leaf = take(tree.leaf, False)
    is_leaf = jnp.all(children < 0, axis=1) & slot
    # Nodes re-leafed by truncation: restore the optimistic leaf bound.
    d = depth.astype(jnp.float32)
    optimistic = vl + gamma ** d / (1 - gamma) * (~done).astype(jnp.float32)
    vu = jnp.where(is_leaf & ~was_leaf, jnp.where(done, vl, optimistic), vu)

    # Bottom-up interior recompute: repeated vectorized max-over-children
    # passes converge in <= max carried depth sweeps. The while_loop exits as
    # soon as a sweep is a fixed point, so shallow carried trees pay only
    # their actual depth, not the static ``backup_sweeps`` cap.
    cvalid = children >= 0
    cidx = jnp.maximum(children, 0)
    interior = ~is_leaf & slot

    def sweep(vl, vu):
        cl = jnp.max(jnp.where(cvalid, vl[cidx], -jnp.inf), axis=1)
        cu = jnp.max(jnp.where(cvalid, vu[cidx], -jnp.inf), axis=1)
        return jnp.where(interior, cl, vl), jnp.where(interior, cu, vu)

    def cond(carry):
        i, _, _, changed = carry
        return (i < backup_sweeps) & changed

    def body(carry):
        i, vl, vu, _ = carry
        nvl, nvu = sweep(vl, vu)
        changed = jnp.any((nvl != vl) | (nvu != vu))
        return i + 1, nvl, nvu, changed

    _, vl, vu, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), vl, vu, jnp.bool_(True)))

    states = jax.tree.map(lambda x: x[old_of_new], tree.states)
    new_tree = OPDTree(parent=parent, action=act, depth=depth, children=children,
                       reward=reward, done=done, value_lower=vl, value_upper=vu,
                       leaf=is_leaf, count=count, used=used, states=states)
    return new_tree, valid


def opd_grow_arena(tree: OPDTree, extra: int) -> OPDTree:
    """Pad every arena array with ``extra`` unallocated slots so a carried
    tree can absorb the next plan's expansions."""
    def pad(x, fill):
        pad_block = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, pad_block], axis=0)
    states = jax.tree.map(lambda x: pad(x, 0), tree.states)
    return OPDTree(
        parent=pad(tree.parent, -1), action=pad(tree.action, -1),
        depth=pad(tree.depth, 0), children=pad(tree.children, -1),
        reward=pad(tree.reward, 0), done=pad(tree.done, False),
        value_lower=pad(tree.value_lower, 0), value_upper=pad(tree.value_upper, 0),
        leaf=pad(tree.leaf, False), count=pad(tree.count, 0),
        used=tree.used, states=states)


def opd_plan_batch_vmap(env: FunctionalEnv, params, states0, keys, num_actions: int,
                        expansions: int, gamma: float, terminal_reward: float = 0.0,
                        plan_capacity: int = 32):
    """vmap of opd_plan over a leading tree-batch axis of states/keys.

    Kept as the semantics oracle for the fused batch planner below. SLOW at
    scale: vmapping the single-tree program gives batch-major [B, N] arenas
    whose per-tree dynamic row gathers/scatters lower poorly on TPU
    (~98 ms/round at B=4096 on the highway env — ~100x the fused layout)."""
    fn = partial(opd_plan, env, num_actions=num_actions, expansions=expansions,
                 gamma=gamma, terminal_reward=terminal_reward, plan_capacity=plan_capacity)
    return jax.vmap(lambda s, k: fn(params, s, k))(states0, keys)


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions", "plan_capacity"))
def opd_plan_batch(env: FunctionalEnv, params, states0, keys, num_actions: int,
                   expansions: int, gamma: float, terminal_reward: float = 0.0,
                   plan_capacity: int = 32):
    """Fused batched OPD with an explicit tree-batch axis — same algorithm
    and bit-identical bounds as ``opd_plan`` per tree, node-major [N, B]
    arena layout (the mcts_fused.py discipline): per-tree indexing is always
    ``array[row_index_vector, lane_iota]`` (lane-aligned gathers/scatters,
    the fast TPU lowering) and per-round child blocks land at round-indexed
    batch-invariant row bases (a plain dynamic_update_slice). The vmapped
    single-tree program (opd_plan_batch_vmap) produces batch-major [B, N]
    arenas whose per-tree row indexing lowers ~100x slower.

    Returns (actions [B, P], lengths [B], tree) with ``tree`` a
    batch-leading OPDTree view, like the vmapped path.
    """
    from rl_agents_tpu.ops.onehot import (
        gather_rows,
        gather_rows_tree,
        row_onehot,
        scatter_rows,
    )

    A, R = num_actions, expansions
    N = 1 + R * A
    flat0 = jax.tree.leaves(states0)
    B = flat0[0].shape[0]
    gammaf = jnp.float32(gamma)
    terminal_reward = jnp.float32(terminal_reward)
    iota = jnp.arange(B, dtype=jnp.int32)

    # node-major arenas [N, B]; states [N, B, ...]
    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + x.shape, x.dtype).at[0].set(x), states0)
    vl = jnp.zeros((N, B))
    vu = jnp.zeros((N, B))
    leaf = jnp.zeros((N, B), bool).at[0].set(True)
    done = jnp.zeros((N, B), bool)
    depth = jnp.zeros((N, B), jnp.int32)
    reward = jnp.zeros((N, B))
    first_child = jnp.full((N, B), -1, jnp.int32)
    expanded = jnp.zeros((R, B), jnp.int32)  # which node each round expanded

    # outer vmap over actions (state shared), inner over the tree batch
    step_env = jax.vmap(jax.vmap(env.transition, in_axes=(None, 0, 0, None)),
                        in_axes=(None, None, 0, None))

    actions_block = jnp.broadcast_to(
        jnp.arange(A, dtype=jnp.int32)[:, None], (A, B))
    zero_keys = jnp.zeros((2,), jnp.uint32)

    def round_fn(i, carry):
        states, vl, vu, leaf, done, depth, reward, first_child, expanded = carry
        base = 1 + i * A

        scores = jnp.where(leaf, vu, -jnp.inf)
        leaf_idx = jnp.argmax(scores, axis=0).astype(jnp.int32)  # [B]; first
        # max == earliest-created leaf (rows are in creation order),
        # matching the reference's insertion-ordered max() tie-break

        # batch-varying row gathers as dense one-hot reductions — the
        # per-lane advanced-indexing lowering costs ~10-20 ms per call on
        # TPU at B=4096 and dominated the whole planner (r2 roofline: 0.4%
        # of HBM bandwidth); the one-hot stream runs at memory speed
        oh = row_onehot(leaf_idx, N)                                    # [N, B]
        leaf_state = gather_rows_tree(states, oh)                       # [B, ...]
        d = gather_rows(depth, oh) + 1                                  # [B]
        vl_leaf = gather_rows(vl, oh)
        done_leaf = gather_rows(done, oh)

        outs = step_env(params, leaf_state, actions_block, zero_keys)   # [A, B]
        r = outs.reward.astype(jnp.float32)
        df = d.astype(jnp.float32)
        child_done = outs.terminated | done_leaf[None, :]
        child_vl = vl_leaf[None, :] + gammaf ** (df - 1)[None, :] * r
        child_vu = child_vl + gammaf ** df[None, :] / (1 - gammaf)
        terminal_value = child_vl + terminal_reward * gammaf ** df[None, :] / (1 - gammaf)
        child_vl = jnp.where(child_done, terminal_value, child_vl)
        child_vu = jnp.where(child_done, terminal_value, child_vu)

        def put(arena, rows):
            return jax.lax.dynamic_update_slice_in_dim(arena, rows, base, axis=0)

        states = jax.tree.map(put, states, outs.state)
        vl = put(vl, child_vl)
        vu = put(vu, child_vu)
        done = put(done, child_done)
        depth = put(depth, jnp.broadcast_to(d[None, :], (A, B)))
        reward = put(reward, r)
        leaf = put(leaf, jnp.ones((A, B), bool)) & ~oh
        first_child = scatter_rows(first_child, oh, base)
        expanded = expanded.at[i].set(leaf_idx)
        return states, vl, vu, leaf, done, depth, reward, first_child, expanded

    states, vl, vu, leaf, done, depth, reward, first_child, expanded = \
        jax.lax.fori_loop(0, R, round_fn, (states, vl, vu, leaf, done, depth,
                                           reward, first_child, expanded))

    # -- bottom-up consolidation: ONE exact reverse-topological pass ---------
    # children are always created at higher row indices than their parent, so
    # walking rounds in reverse finalizes each interior node exactly once —
    # the same fixed point as _finalize_bounds (f32 max is exact) without the
    # depth-many [N, A, B] gather sweeps of the old while_loop.
    has_children = first_child >= 0                               # [N, B]
    count = jnp.ones((N, B), jnp.int32)

    def consolidate(j, c):
        vl, vu, cnt = c
        r = R - 1 - j
        base = 1 + r * A

        def rows(arr):  # [A, B] child block — batch-invariant slice
            return jax.lax.dynamic_slice_in_dim(arr, base, A, axis=0)

        oh = row_onehot(expanded[r], N)
        vl = scatter_rows(vl, oh, jnp.max(rows(vl), axis=0))
        vu = scatter_rows(vu, oh, jnp.max(rows(vu), axis=0))
        cnt = scatter_rows(cnt, oh, 1 + jnp.sum(rows(cnt), axis=0))
        return vl, vu, cnt

    vl, vu, count = jax.lax.fori_loop(0, R, consolidate, (vl, vu, count))

    # -- greedy plan by value_lower, random tie-breaks (as _greedy_plan) -----
    master = keys[0]

    def plan_body(c, h):
        node, live = c
        oh_node = row_onehot(node, N)
        fc = gather_rows(first_child, oh_node)
        valid = fc >= 0
        fc0 = jnp.where(valid, fc, 0)
        vals = jnp.stack([gather_rows(vl, row_onehot(fc0 + a, N))
                          for a in range(A)])                     # [A, B]
        vals = jnp.where(valid[None, :], vals, -jnp.inf)
        m = jnp.max(vals, axis=0)
        ties = jnp.where(vals == m[None, :], 0.0, -jnp.inf)
        g = jax.random.gumbel(jax.random.fold_in(master, h), (A, B), jnp.float32)
        action = jnp.argmax(ties + g, axis=0).astype(jnp.int32)
        emit = live & valid
        node = jnp.where(emit, fc + action, node)
        return (node, emit), jnp.where(emit, action, -1)

    (_, _), acts = jax.lax.scan(
        plan_body, (jnp.zeros((B,), jnp.int32), jnp.ones((B,), bool)),
        jnp.arange(plan_capacity))
    actions = acts.T
    lengths = jnp.sum(actions >= 0, axis=1)

    # -- batch-leading OPDTree view (drop-in for the vmapped path) -----------
    parent = jnp.concatenate(
        [jnp.full((1, B), -1, jnp.int32), jnp.repeat(expanded, A, axis=0)], axis=0)
    action_from = jnp.concatenate(
        [jnp.full((1, B), -1, jnp.int32),
         jnp.broadcast_to(jnp.tile(jnp.arange(A, dtype=jnp.int32), R)[:, None],
                          (R * A, B))], axis=0)
    children = jnp.where(has_children.T[:, :, None],
                         first_child.T[:, :, None]
                         + jnp.arange(A, dtype=jnp.int32)[None, None, :], -1)
    tree = OPDTree(
        parent=parent.T, action=action_from.T, depth=depth.T, children=children,
        reward=reward.T, done=done.T, value_lower=vl.T, value_upper=vu.T,
        leaf=leaf.T, count=count.T,
        used=jnp.full((B,), N, jnp.int32),
        states=jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), states))
    return actions, lengths, tree


class DeterministicPlannerAgent(AbstractTreeSearchAgent):
    """OPD agent (reference: deterministic.py:135-139). Supports
    ``step_strategy: subtree`` natively: the node arena is re-rooted with
    ``opd_step_subtree`` between env steps and the next plan continues in the
    carried tree (reference: deterministic.py:124-132)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({"budget": 100, "subtree_carry": None})
        return config

    def make_planner(self):
        self.carried_tree = None  # arena carried across steps (subtree strategy)

    def _sizes(self, num_actions):
        expansions = max(int(self.config["budget"]) // num_actions, 1)
        carry = self.config.get("subtree_carry") or expansions * num_actions
        return expansions, int(carry)

    def planner_plan(self, env, observation):
        functional = env.functional
        num_actions = functional.action_space.n
        expansions, _ = self._sizes(num_actions)
        kwargs = dict(num_actions=num_actions, expansions=expansions,
                      gamma=float(self.config["gamma"]),
                      terminal_reward=float(self.config["terminal_reward"]),
                      plan_capacity=min(max(expansions, 1), 64))
        if self.carried_tree is not None:
            actions, length, tree = opd_plan_continue(
                functional, env.params, self.carried_tree, env.state,
                self.next_key(), **kwargs)
        else:
            actions, length, tree = opd_plan(
                functional, env.params, env.state, self.next_key(), **kwargs)
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)

    def planner_step_tree(self, actions):
        if self.config["step_strategy"] != "subtree":
            return
        tree = self.last_plan_data
        if tree is None or not actions:
            self.carried_tree = None
            return
        num_actions = tree.children.shape[1]
        expansions, carry = self._sizes(num_actions)
        new_tree, valid = opd_step_subtree(
            tree, int(actions[0]), float(self.config["gamma"]),
            num_actions=num_actions, out_capacity=carry)
        if bool(valid):
            self.carried_tree = opd_grow_arena(new_tree, expansions * num_actions)
        else:  # never-explored action: plan from scratch (abstract.py:203-206)
            self.carried_tree = None

    def reset(self):
        super().reset()
        self.carried_tree = None
