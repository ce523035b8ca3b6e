"""Closed-loop MCTS: chance nodes keyed by observed outcomes.

Rebuild of the reference MCTS ``closed_loop`` option (mcts.py:147,267-273):
when enabled, each action edge holds children keyed by the observed next
state, so value estimates condition on outcomes instead of open-loop action
sequences. Uses the decision/chance arena layout of mcts_dpw with the plain
MCTS selection score ``value + T * |children| * prior / (count + 1)`` and
full action expansion with priors.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.mcts import _masked_random_argmax
from rl_agents_tpu.agents.tree_search.mcts_dpw import DPWTree
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key
from rl_agents_tpu.ops.onehot import onehot, select_row


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon", "width"))
def mcts_closed_loop_plan(env: FunctionalEnv, params, state0, key, prior_probs,
                          rollout_probs, num_actions: int, episodes: int,
                          horizon: int, gamma: float, temperature: float,
                          width: int = 8):
    A, W = num_actions, width
    Nd = 2 + episodes * horizon
    Nc = 1 + Nd * A
    gamma = jnp.float32(gamma)

    tree = DPWTree(
        d_parent=jnp.full((Nd,), -1, jnp.int32),
        d_count=jnp.zeros((Nd,), jnp.int32),
        d_value=jnp.zeros((Nd,)),
        d_children=jnp.full((Nd, A), -1, jnp.int32),
        d_n_children=jnp.zeros((Nd,), jnp.int32),
        c_parent=jnp.full((Nc,), -1, jnp.int32),
        c_action=jnp.full((Nc,), -1, jnp.int32),
        c_count=jnp.zeros((Nc,), jnp.int32),
        c_value=jnp.zeros((Nc,)),
        c_child_keys=jnp.zeros((Nc, W), jnp.uint32),
        c_children=jnp.full((Nc, W), -1, jnp.int32),
        c_n_children=jnp.zeros((Nc,), jnp.int32),
        d_used=jnp.ones((), jnp.int32),
        c_used=jnp.zeros((), jnp.int32),
    )
    # store priors per chance (action) node
    c_prior = jnp.ones((Nc,))

    def expand_decision(tree, c_prior, node):
        """All actions at once with priors (reference: mcts.py:237-246).
        One-hot arena access (ops/onehot.py): per-lane scalar indexing under
        a tree-batch vmap is the TPU pathology."""
        oh_n = onehot(node, Nd)
        is_leaf = select_row(tree.d_children, oh_n)[0] < 0
        base = tree.c_used
        ids = base + jnp.arange(A, dtype=jnp.int32)
        iota_c = jnp.arange(Nc, dtype=jnp.int32)
        oh_blk = (iota_c >= base) & (iota_c < base + A) & is_leaf
        blk_action = (iota_c - base).astype(jnp.int32)
        tree = tree._replace(
            d_children=jnp.where(oh_n[:, None] & is_leaf, ids[None, :],
                                 tree.d_children),
            d_n_children=jnp.where(oh_n & is_leaf, A, tree.d_n_children),
            c_parent=jnp.where(oh_blk, node, tree.c_parent),
            c_action=jnp.where(oh_blk, blk_action, tree.c_action),
            c_used=tree.c_used + jnp.where(is_leaf, A, 0))
        blk_prior = jnp.sum(jnp.where(
            (blk_action[:, None] == jnp.arange(A)[None, :]) & oh_blk[:, None],
            prior_probs[None, :], 0.0), axis=1)
        c_prior = jnp.where(oh_blk, blk_prior, c_prior)
        return tree, c_prior

    def obs_child(tree, chance, obs, k):
        """Obs-keyed chance child (reference: mcts.py:267-273), capped at W."""
        key_ = obs_key(obs)
        oh_c = onehot(chance, Nc)
        keys_row = select_row(tree.c_child_keys, oh_c)
        children_row = select_row(tree.c_children, oh_c)
        n = select_row(tree.c_n_children, oh_c)
        slots = jnp.arange(W)
        match = (keys_row == key_) & (slots < n)
        exists = jnp.any(match)
        insert = (~exists) & (n < W)
        k, kr = jax.random.split(k)
        random_slot = jax.random.randint(kr, (), 0, jnp.maximum(n, 1))
        slot = jnp.where(exists, jnp.argmax(match), jnp.where(insert, n, random_slot))
        new_id = tree.d_used
        oh_w = onehot(slot, W)
        child = jnp.where(insert, new_id,
                          jnp.sum(jnp.where(oh_w, children_row, 0)))
        oh_cw = oh_c[:, None] & oh_w[None, :]
        oh_new_d = onehot(new_id, Nd)
        tree = tree._replace(
            c_child_keys=jnp.where(oh_cw & insert, key_, tree.c_child_keys),
            c_children=jnp.where(oh_cw & insert, new_id, tree.c_children),
            c_n_children=tree.c_n_children + (oh_c & insert).astype(jnp.int32),
            d_parent=jnp.where(oh_new_d & insert, chance, tree.d_parent),
            d_used=tree.d_used + insert.astype(jnp.int32))
        return tree, child, k

    def episode_fn(_, carry):
        tree, c_prior, key = carry
        key, kd, kroll = jax.random.split(key, 3)

        def cond(c):
            tree, c_prior, node, state, depth, total, terminal, k = c
            first_child = select_row(tree.d_children, onehot(node, Nd))[0]
            return (first_child >= 0) & (depth < horizon) & ~terminal

        def body(c):
            tree, c_prior, node, state, depth, total, terminal, k = c
            ch = select_row(tree.d_children, onehot(node, Nd))
            valid = ch >= 0
            ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) \
                & valid[:, None]
            cvals = jnp.sum(jnp.where(ch_oh, tree.c_value[None, :], 0.0), axis=1)
            cprior = jnp.sum(jnp.where(ch_oh, c_prior[None, :], 0.0), axis=1)
            ccnt = jnp.sum(jnp.where(ch_oh, tree.c_count[None, :], 0), axis=1)
            n_children = jnp.sum(valid).astype(jnp.float32)
            scores = cvals + temperature * n_children * cprior / (
                ccnt.astype(jnp.float32) + 1.0)
            k, ka, ks = jax.random.split(k, 3)
            action = _masked_random_argmax(ka, scores, valid)
            out = env.step(params, state, action, ks)
            sel_chance = jnp.sum(jnp.where(jnp.arange(A) == action, ch, 0))
            tree, child, k = obs_child(tree, sel_chance, out.obs, k)
            total = total + gamma ** depth.astype(jnp.float32) * out.reward
            return (tree, c_prior, child, out.state, depth + 1, total,
                    terminal | out.terminated, k)

        tree, c_prior, node, state, depth, total, terminal, kd = jax.lax.while_loop(
            cond, body, (tree, c_prior, jnp.zeros((), jnp.int32), state0,
                         jnp.zeros((), jnp.int32), jnp.zeros(()),
                         jnp.zeros((), bool), kd))

        do_expand = (depth < horizon) & (~terminal | (node == 0))
        tree, c_prior = jax.lax.cond(
            do_expand, lambda tc: expand_decision(tc[0], tc[1], node),
            lambda tc: tc, (tree, c_prior))

        def rollout_body(c, _):
            state, h, total, terminal, k = c
            k, ka, ks = jax.random.split(k, 3)
            action = jax.random.categorical(ka, jnp.log(rollout_probs))
            out = env.step(params, state, action, ks)
            live = (h < horizon) & ~terminal
            total = total + jnp.where(live, gamma ** h.astype(jnp.float32) * out.reward, 0.0)
            state = jax.tree.map(lambda old, new: jnp.where(live, new, old), state, out.state)
            return (state, h + 1, total, terminal | (live & out.terminated), k), None

        (_, _, rolled, _, _), _ = jax.lax.scan(
            rollout_body, (state, depth, total, terminal, kroll), None, length=horizon)
        total = jnp.where(terminal, total, rolled)

        def up_cond(c):
            n, _, _, _, _ = c
            return n >= 0

        def up_body(c):
            n, d_count, d_value, c_count, c_value = c
            oh_n = onehot(n, Nd)
            d_count = d_count + oh_n.astype(jnp.int32)
            cnt = jnp.sum(jnp.where(oh_n, d_count, 0)).astype(jnp.float32)
            v_old = jnp.sum(jnp.where(oh_n, d_value, 0.0))
            d_value = jnp.where(oh_n, v_old + (total - v_old) / cnt, d_value)
            chance = jnp.sum(jnp.where(oh_n, tree.d_parent, 0))
            has = chance >= 0
            oh_ch = onehot(chance, Nc) & has
            c_count = c_count + oh_ch.astype(jnp.int32)
            c_cnt = jnp.maximum(jnp.sum(jnp.where(oh_ch, c_count, 0)), 1).astype(jnp.float32)
            c_old = jnp.sum(jnp.where(oh_ch, c_value, 0.0))
            c_value = jnp.where(oh_ch, c_old + (total - c_old) / c_cnt, c_value)
            nxt = jnp.where(has,
                            jnp.sum(jnp.where(onehot(chance, Nc), tree.c_parent, 0)), -1)
            return nxt, d_count, d_value, c_count, c_value

        _, d_count, d_value, c_count, c_value = jax.lax.while_loop(
            up_cond, up_body, (node, tree.d_count, tree.d_value,
                               tree.c_count, tree.c_value))
        tree = tree._replace(d_count=d_count, d_value=d_value,
                             c_count=c_count, c_value=c_value)
        return tree, c_prior, key

    tree, c_prior, key = jax.lax.fori_loop(0, episodes, episode_fn, (tree, c_prior, key))

    # plan: first action only (conditioned on observations thereafter)
    ch = tree.d_children[0]
    valid = ch >= 0
    ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) & valid[:, None]
    counts = jnp.where(valid, jnp.sum(jnp.where(ch_oh, tree.c_count[None, :], 0), axis=1), -1)
    cvals = jnp.sum(jnp.where(ch_oh, tree.c_value[None, :], 0.0), axis=1)
    tie = valid & (counts == jnp.max(counts))
    action = jnp.argmax(jnp.where(tie, cvals, -jnp.inf))
    return action, tree
