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
        """All actions at once with priors (reference: mcts.py:237-246)."""
        is_leaf = tree.d_children[node, 0] < 0
        base = tree.c_used
        ids = base + jnp.arange(A, dtype=jnp.int32)
        tree = tree._replace(
            d_children=jnp.where(is_leaf, tree.d_children.at[node].set(ids),
                                 tree.d_children),
            d_n_children=jnp.where(is_leaf, tree.d_n_children.at[node].set(A),
                                   tree.d_n_children),
            c_parent=jnp.where(is_leaf, tree.c_parent.at[ids].set(node), tree.c_parent),
            c_action=jnp.where(is_leaf, tree.c_action.at[ids].set(jnp.arange(A)),
                               tree.c_action),
            c_used=tree.c_used + jnp.where(is_leaf, A, 0))
        c_prior = jnp.where(is_leaf, c_prior.at[ids].set(prior_probs), c_prior)
        return tree, c_prior

    def obs_child(tree, chance, obs, k):
        """Obs-keyed chance child (reference: mcts.py:267-273), capped at W."""
        key_ = obs_key(obs)
        keys_row = tree.c_child_keys[chance]
        n = tree.c_n_children[chance]
        slots = jnp.arange(W)
        match = (keys_row == key_) & (slots < n)
        exists = jnp.any(match)
        insert = (~exists) & (n < W)
        k, kr = jax.random.split(k)
        random_slot = jax.random.randint(kr, (), 0, jnp.maximum(n, 1))
        slot = jnp.where(exists, jnp.argmax(match), jnp.where(insert, n, random_slot))
        new_id = tree.d_used
        child = jnp.where(insert, new_id, tree.c_children[chance, slot])
        tree = tree._replace(
            c_child_keys=jnp.where(insert, tree.c_child_keys.at[chance, slot].set(key_),
                                   tree.c_child_keys),
            c_children=jnp.where(insert, tree.c_children.at[chance, slot].set(new_id),
                                 tree.c_children),
            c_n_children=tree.c_n_children + jnp.where(
                insert, jnp.zeros_like(tree.c_n_children).at[chance].set(1), 0),
            d_parent=jnp.where(insert, tree.d_parent.at[new_id].set(chance), tree.d_parent),
            d_used=tree.d_used + insert.astype(jnp.int32))
        return tree, child, k

    def episode_fn(_, carry):
        tree, c_prior, key = carry
        key, kd, kroll = jax.random.split(key, 3)

        def cond(c):
            tree, c_prior, node, state, depth, total, terminal, k = c
            return (tree.d_children[node, 0] >= 0) & (depth < horizon) & ~terminal

        def body(c):
            tree, c_prior, node, state, depth, total, terminal, k = c
            ch = tree.d_children[node]
            valid = ch >= 0
            chs = jnp.maximum(ch, 0)
            n_children = jnp.sum(valid).astype(jnp.float32)
            scores = tree.c_value[chs] + temperature * n_children * c_prior[chs] / (
                tree.c_count[chs].astype(jnp.float32) + 1.0)
            k, ka, ks = jax.random.split(k, 3)
            action = _masked_random_argmax(ka, scores, valid)
            out = env.step(params, state, action, ks)
            tree, child, k = obs_child(tree, ch[action], out.obs, k)
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
            d_count = d_count.at[n].add(1)
            d_value = d_value.at[n].add((total - d_value[n]) / d_count[n].astype(jnp.float32))
            chance = tree.d_parent[n]

            def upd(args):
                chance, c_count, c_value = args
                c_count = c_count.at[chance].add(1)
                c_value = c_value.at[chance].add(
                    (total - c_value[chance]) / c_count[chance].astype(jnp.float32))
                return c_count, c_value

            c_count, c_value = jax.lax.cond(chance >= 0, upd,
                                            lambda a: (a[1], a[2]),
                                            (chance, c_count, c_value))
            nxt = jnp.where(chance >= 0, tree.c_parent[chance], -1)
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
    chs = jnp.maximum(ch, 0)
    counts = jnp.where(valid, tree.c_count[chs], -1)
    tie = valid & (counts == jnp.max(counts))
    action = jnp.argmax(jnp.where(tie, tree.c_value[chs], -jnp.inf))
    return action, tree
