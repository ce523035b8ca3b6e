"""Fused batched MCTS: explicit tree-batch axis, minimal sequential steps.

Same algorithm as ``mcts_plan`` (reference: tree_search/mcts.py:100-305 — UCT
selection, leaf expansion, random rollout, mean-return backup), restructured
for TPU throughput. ``mcts_plan`` vmapped over trees runs ~25 sequential loop
iterations per episode (descend-while + rollout-scan + backup-while), and each
iteration is a separate tiny launch touching [B]-wide HBM arrays — a ~3-4 ms
floor per plan-batch regardless of batch size. This version restructures the
episode so the device runs ~H+2 sequential steps instead:

* descend and rollout share ONE fixed H-step ``fori_loop``: each tree is
  either in-tree (UCT action) or rolling out (random action), tracked by a
  per-tree phase bit; every tree takes at most H env steps per episode either
  way, so the fused loop does no extra work;
* expansion happens inline at the step where a tree first reaches a leaf;
  arena slots are per-episode (episode e expands into ``1 + e*A .. e*A + A``),
  so the tree needs no ``used`` counter and the per-action priors become a
  single static array;
* the descent path is recorded as node ids ([H+1] per tree), and the backup
  becomes ONE gather + scatter-add pass over the whole path instead of a
  parent-walking while_loop (path nodes are distinct, so the mean-value
  update for all of them commutes);
* child pointers are a single ``first_child[N, B]`` array (children of a node
  are consecutive slots), A× less tree memory traffic than children[N, A, B].

Node-major [N, B] layouts keep per-step gathers/scatters contiguous along the
batch (lane) axis. RNG uses one key per step: batched ``categorical`` over
[A, B] logits draws independently per tree, so per-tree key chains (and their
per-step split traffic) are unnecessary; agreement with ``mcts_plan`` is
statistical, not bitwise.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.mcts import MCTSTree
from rl_agents_tpu.ops.onehot import gather_rows, row_onehot, scatter_rows


class _Arena(NamedTuple):
    first_child: Any  # [N, B] i32, -1 when leaf
    count: Any        # [N, B] f32 visit counts
    value: Any        # [N, B] f32 mean returns
    expansions: Any   # [B] i32 (for the compat `used` counter)


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon",
                                   "unroll"))
def mcts_plan_batch_fused(env, params, states0, keys, prior_probs, rollout_probs,
                          num_actions: int, episodes: int, horizon: int,
                          gamma: float, temperature: float, unroll: int = 1):
    """Plan for B independent trees; returns (actions [B, H], lengths [B], tree).

    The returned tree is a batch-leading ``MCTSTree`` view of the arena
    (children rebuilt from first_child; slots are episode-indexed rather than
    allocation-ordered, which only changes internal node numbering).
    """
    A, H = num_actions, horizon
    flat0 = jax.tree.leaves(states0)
    B = flat0[0].shape[0]
    N = 1 + episodes * A
    gammaf = jnp.float32(gamma)
    batch_iota = jnp.arange(B, dtype=jnp.int32)
    # per-action UCT bonus numerator: temperature * |children| * prior(a)
    # (reference mcts.py:275-286; expansion always creates all A children)
    bonus = (temperature * A * prior_probs).astype(jnp.float32)[:, None]  # [A,1]
    rollout_logits = jnp.broadcast_to(
        jnp.log(rollout_probs)[:, None], (A, B)).astype(jnp.float32)

    step_env = jax.vmap(env.transition, in_axes=(None, 0, 0, 0))
    master = keys[0]
    # deterministic envs ignore their key: skip the per-step B-way split
    # (one threefry op per sequential hot-loop step)
    zero_keys = None
    if not env.transition_uses_key:
        zero_keys = jnp.zeros((B, 2), jnp.uint32)

    # (Measured and rejected: pre-generating all gumbel noise as an
    # [episodes, H, 2, A, B] HBM table and slicing per step is ~45% SLOWER
    # than in-loop threefry — on TPU the per-step 160 KB HBM read costs more
    # than recomputing the noise in-register.)
    def episode_fn(ep, carry):
        arena, key = carry
        kep = jax.random.fold_in(key, ep)
        base = 1 + ep * A  # this episode's expansion slots

        def fused_step(h, c):
            arena, state, node, in_tree, terminal, total, visited, weights = c
            ka = jax.random.fold_in(kep, h)

            # batch-varying row gathers/scatters as dense one-hot streams
            # (per-lane advanced indexing is the TPU pathology — see
            # ops/onehot.py; this took OPD from 52k to 10M expansions/s)
            oh_node = row_onehot(node, N)                       # [N, B]
            fc = gather_rows(arena.first_child, oh_node)        # [B]
            has_children = fc >= 0

            # -- inline expansion at first leaf (reference mcts.py:151-154) --
            do_expand = in_tree & ~has_children                 # in_tree ⇒ ~terminal
            arena = arena._replace(
                first_child=scatter_rows(arena.first_child,
                                         oh_node & do_expand[None, :], base),
                expansions=arena.expansions + do_expand.astype(jnp.int32))

            # -- action: UCT while descending, rollout policy otherwise ------
            fc0 = jnp.where(has_children, fc, 0)
            cvals = jnp.stack([gather_rows(arena.value, row_onehot(fc0 + a, N))
                               for a in range(A)])              # [A, B]
            ccnts = jnp.stack([gather_rows(arena.count, row_onehot(fc0 + a, N))
                               for a in range(A)])
            scores = cvals + bonus / (ccnts + 1.0)
            m = jnp.max(scores, axis=0)
            tie_logits = jnp.where(scores == m[None, :], 0.0, -jnp.inf)
            g = jax.random.gumbel(ka, (2, A, B), jnp.float32)
            act_uct = jnp.argmax(tie_logits + g[0], axis=0)
            act_roll = jnp.argmax(rollout_logits + g[1], axis=0)
            descending = in_tree & has_children
            action = jnp.where(descending, act_uct, act_roll).astype(jnp.int32)

            # -- env step (masked once terminal) -----------------------------
            live = ~terminal
            step_keys = zero_keys if zero_keys is not None else \
                jax.random.split(jax.random.fold_in(ka, 1), B)
            out = step_env(params, state, action, step_keys)
            total = total + jnp.where(live, gammaf ** h * out.reward, 0.0)
            state = jax.tree.map(
                lambda old, new: jnp.where(
                    live.reshape((B,) + (1,) * (new.ndim - 1)), new, old),
                state, out.state)
            terminal = terminal | (live & out.terminated)

            # -- tree position + path record ---------------------------------
            child = fc + action
            node = jnp.where(descending, child, node)
            visited = visited.at[h + 1].set(node)
            weights = weights.at[h + 1].set(descending.astype(jnp.float32))
            in_tree = descending & ~terminal
            return arena, state, node, in_tree, terminal, total, visited, weights

        visited0 = jnp.zeros((H + 1, B), jnp.int32)
        weights0 = jnp.zeros((H + 1, B)).at[0].set(1.0)  # root always on path
        arena, _, _, _, _, total, visited, weights = jax.lax.fori_loop(
            0, H, fused_step, unroll=unroll, init_val=
            (arena, states0, jnp.zeros((B,), jnp.int32),
             jnp.ones((B,), bool), jnp.zeros((B,), bool), jnp.zeros((B,)),
             visited0, weights0))

        # -- backup: one pass over the recorded path (reference mcts.py:248-265)
        # path nodes are distinct within a tree (weights mask the rest), so the
        # per-node running-mean updates commute; the scatter-adds and gathers
        # are dense one-hot streams over the path-position axis.
        oh_path = visited[:, None, :] == jnp.arange(N, dtype=jnp.int32)[None, :, None]
        count = arena.count + jnp.sum(
            jnp.where(oh_path, weights[:, None, :], 0.0), axis=0)
        cnt_new = jax.vmap(lambda oh: gather_rows(count, oh))(oh_path)     # [H+1, B]
        val_old = jax.vmap(lambda oh: gather_rows(arena.value, oh))(oh_path)
        delta = weights * (total[None, :] - val_old) / jnp.maximum(cnt_new, 1.0)
        value = arena.value + jnp.sum(
            jnp.where(oh_path, delta[:, None, :], 0.0), axis=0)
        return arena._replace(count=count, value=value), key

    arena = _Arena(
        first_child=jnp.full((N, B), -1, jnp.int32),
        count=jnp.zeros((N, B)),
        value=jnp.zeros((N, B)),
        expansions=jnp.zeros((B,), jnp.int32),
    )
    arena, _ = jax.lax.fori_loop(0, episodes, episode_fn, (arena, master))

    # -- plan extraction (reference mcts.py:212-218): max count, ties by value
    def plan_body(c, _):
        node, live = c
        fc = gather_rows(arena.first_child, row_onehot(node, N))
        valid = fc >= 0
        fc0 = jnp.where(valid, fc, 0)
        counts = jnp.stack([gather_rows(arena.count, row_onehot(fc0 + a, N))
                            for a in range(A)])
        counts = jnp.where(valid[None, :], counts, -1.0)
        best = jnp.max(counts, axis=0)
        cvals = jnp.stack([gather_rows(arena.value, row_onehot(fc0 + a, N))
                           for a in range(A)])
        vals = jnp.where(counts == best[None, :], cvals, -jnp.inf)
        action = jnp.argmax(vals, axis=0).astype(jnp.int32)
        emit = live & valid
        node = jnp.where(emit, fc + action, node)
        return (node, emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((B,), jnp.int32), jnp.ones((B,), bool)),
        None, length=H)
    actions = actions.T  # [B, H]
    lengths = jnp.sum(actions >= 0, axis=1)

    # -- compat MCTSTree view (batch-leading) ---------------------------------
    fc_t = arena.first_child.T  # [B, N]
    children = jnp.where(
        (fc_t >= 0)[:, :, None],
        fc_t[:, :, None] + jnp.arange(A, dtype=jnp.int32)[None, None, :], -1)
    # parent of slot 1+e*A+a is whichever node points at base 1+e*A
    slot_base = 1 + ((jnp.arange(N) - 1) // A) * A  # [N]
    parent = jnp.argmax(fc_t[:, :, None] == slot_base[None, None, :], axis=1)
    parent = jnp.where(
        jnp.any(fc_t[:, :, None] == slot_base[None, None, :], axis=1)
        & (jnp.arange(N) > 0)[None, :], parent, -1).astype(jnp.int32)
    prior = jnp.broadcast_to(
        jnp.concatenate([jnp.ones((1,)),
                         jnp.tile(prior_probs.astype(jnp.float32), episodes)]),
        (B, N))
    tree = MCTSTree(parent=parent, children=children,
                    count=arena.count.T.astype(jnp.int32), value=arena.value.T,
                    prior=prior, used=1 + A * arena.expansions)
    return actions, lengths, tree
