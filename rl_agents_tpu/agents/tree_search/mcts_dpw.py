"""MCTS with Double Progressive Widening, array-encoded.

Rebuild of the reference planner (tree_search/mcts_dpw.py:29-193): UCT where
both the action set and the observed-outcome set of each node are widened
progressively — a new child is inserted only while ``k * count^alpha``
exceeds the current child count (action insertion mcts_dpw.py:120-127,
observation insertion mcts_dpw.py:171-182 via sha1 obs ids — here uint32 obs
hashes over fixed child-slot arrays). Decision and chance arenas alternate;
one jitted program runs all episodes.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.mcts import MCTSAgent, _masked_random_argmax
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key
from rl_agents_tpu.ops.onehot import onehot, select_row


class DPWTree(NamedTuple):
    # decision nodes
    d_parent: Any     # [Nd] i32 chance parent
    d_count: Any      # [Nd] i32
    d_value: Any      # [Nd] f32
    d_children: Any   # [Nd, A] i32 chance ids (per action)
    d_n_children: Any  # [Nd] i32
    # chance nodes
    c_parent: Any     # [Nc] i32 decision parent
    c_action: Any     # [Nc] i32
    c_count: Any      # [Nc] i32
    c_value: Any      # [Nc] f32
    c_child_keys: Any  # [Nc, W] uint32 obs keys
    c_children: Any   # [Nc, W] i32 decision ids
    c_n_children: Any  # [Nc] i32
    d_used: Any
    c_used: Any


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon",
                                   "width", "closed_loop"))
def mcts_dpw_plan(env: FunctionalEnv, params, state0, key, rollout_probs,
                  num_actions: int, episodes: int, horizon: int, gamma: float,
                  temperature: float, k_action: float, alpha_action: float,
                  k_state: float, alpha_state: float, width: int = 8,
                  closed_loop: bool = True):
    A, W = num_actions, width
    Nd = 1 + episodes * horizon
    Nc = 1 + episodes * horizon
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

    def decision_get_child(tree, node, k):
        """Action progressive widening (reference: mcts_dpw.py:106-127,139-154).
        All arena access is one-hot masked (ops/onehot.py): per-lane scalar
        gathers/scatters under a tree-batch vmap are the TPU pathology."""
        oh_d = onehot(node, Nd)
        n_children = select_row(tree.d_n_children, oh_d)
        count = select_row(tree.d_count, oh_d).astype(jnp.float32)
        widen = (n_children < A) & (k_action * count ** alpha_action >= n_children.astype(jnp.float32))

        k, ka, ks = jax.random.split(k, 3)
        # expand: random unexplored action
        ch = select_row(tree.d_children, oh_d)
        unexplored = ch < 0
        new_action = jax.random.categorical(ka, jnp.where(unexplored, 0.0, -jnp.inf))
        new_chance = tree.c_used
        # select: UCB over explored children (child stats via one-hot)
        explored = ch >= 0
        ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) \
            & explored[:, None]                                        # [A, Nc]
        c_count = jnp.maximum(jnp.sum(
            jnp.where(ch_oh, tree.c_count[None, :], 0), axis=1).astype(jnp.float32), 1e-6)
        c_value = jnp.sum(jnp.where(ch_oh, tree.c_value[None, :], 0.0), axis=1)
        ucb = c_value + temperature * jnp.sqrt(
            jnp.log(jnp.maximum(count / c_count, 1.0)))
        sel_action = _masked_random_argmax(ks, ucb, explored)

        action = jnp.where(widen, new_action, sel_action)
        oh_a = onehot(action, A)
        sel_chance = jnp.sum(jnp.where(oh_a, ch, 0))
        chance = jnp.where(widen, new_chance, sel_chance)
        oh_na = oh_d[:, None] & oh_a[None, :]
        oh_new_c = onehot(new_chance, Nc)
        tree = tree._replace(
            d_children=jnp.where(oh_na & widen, new_chance, tree.d_children),
            d_n_children=tree.d_n_children + (oh_d & widen).astype(jnp.int32),
            c_parent=jnp.where(oh_new_c & widen, node, tree.c_parent),
            c_action=jnp.where(oh_new_c & widen, action, tree.c_action),
            c_used=tree.c_used + widen.astype(jnp.int32),
        )
        return tree, chance, action, k

    def chance_get_child(tree, chance, obs, k):
        """State progressive widening over hashed observations
        (reference: mcts_dpw.py:168-182)."""
        key_ = obs_key(obs) if closed_loop else jnp.uint32(1)
        oh_c = onehot(chance, Nc)
        keys_row = select_row(tree.c_child_keys, oh_c)
        n = select_row(tree.c_n_children, oh_c)
        slots = jnp.arange(W)
        match = (keys_row == key_) & (slots < n)
        exists = jnp.any(match)
        match_slot = jnp.argmax(match)

        count = select_row(tree.c_count, oh_c).astype(jnp.float32)
        can_widen = (n < W) & (k_state * count ** alpha_state >= n.astype(jnp.float32))
        k, kr = jax.random.split(k)
        random_slot = jax.random.randint(kr, (), 0, jnp.maximum(n, 1))

        new_decision = tree.d_used
        insert = (~exists) & can_widen
        slot = jnp.where(exists, match_slot, jnp.where(insert, n, random_slot))
        oh_w = onehot(slot, W)
        oh_cw = oh_c[:, None] & oh_w[None, :]
        existing_child = jnp.sum(jnp.where(oh_cw, tree.c_children, 0))
        child = jnp.where(insert, new_decision, existing_child)
        oh_new_d = onehot(new_decision, Nd)
        tree = tree._replace(
            c_child_keys=jnp.where(oh_cw & insert, key_, tree.c_child_keys),
            c_children=jnp.where(oh_cw & insert, new_decision, tree.c_children),
            c_n_children=tree.c_n_children + (oh_c & insert).astype(jnp.int32),
            d_parent=jnp.where(oh_new_d & insert, chance, tree.d_parent),
            d_used=tree.d_used + insert.astype(jnp.int32),
        )
        return tree, child, k

    def episode_fn(_, carry):
        tree, key = carry
        key, kd, kroll = jax.random.split(key, 3)

        def cond(c):
            tree, node, state, depth, total, terminal, k = c
            visited = (jnp.sum(jnp.where(onehot(node, Nd), tree.d_count, 0)) != 0) \
                | (node == 0)
            return (depth < horizon) & ~terminal & visited

        def body(c):
            tree, node, state, depth, total, terminal, k = c
            tree, chance, action, k = decision_get_child(tree, node, k)
            k, ks = jax.random.split(k)
            out = env.step(params, state, action, ks)
            tree, child, k = chance_get_child(tree, chance, out.obs, k)
            total = total + gamma ** depth.astype(jnp.float32) * out.reward
            return (tree, child, out.state, depth + 1, total, terminal | out.terminated, k)

        tree, node, state, depth, total, terminal, kd = jax.lax.while_loop(
            cond, body, (tree, jnp.zeros((), jnp.int32), state0, jnp.zeros((), jnp.int32),
                         jnp.zeros(()), jnp.zeros((), bool), kd))

        # rollout (reference: mcts.py:160-177 via inheritance)
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

        # backup alternating decision/chance (reference: mcts_dpw.py:129-137,184-193)
        def up_cond(c):
            n, _, _, _, _ = c
            return n >= 0

        def up_body(c):
            n, d_count, d_value, c_count, c_value = c
            oh_n = onehot(n, Nd)
            d_count = d_count + oh_n.astype(jnp.int32)
            cnt_new = jnp.sum(jnp.where(oh_n, d_count, 0)).astype(jnp.float32)
            val_old = jnp.sum(jnp.where(oh_n, d_value, 0.0))
            d_value = jnp.where(oh_n, val_old + (total - val_old) / cnt_new, d_value)
            chance = jnp.sum(jnp.where(oh_n, tree.d_parent, 0)) \
                + jnp.where(jnp.any(oh_n), 0, -1)
            has_chance = chance >= 0
            oh_ch = onehot(chance, Nc) & has_chance
            c_count = c_count + oh_ch.astype(jnp.int32)
            c_cnt_new = jnp.maximum(jnp.sum(jnp.where(oh_ch, c_count, 0)), 1).astype(jnp.float32)
            c_val_old = jnp.sum(jnp.where(oh_ch, c_value, 0.0))
            c_value = jnp.where(oh_ch, c_val_old + (total - c_val_old) / c_cnt_new, c_value)
            nxt = jnp.where(has_chance,
                            jnp.sum(jnp.where(onehot(chance, Nc), tree.c_parent, 0)), -1)
            return nxt, d_count, d_value, c_count, c_value

        _, d_count, d_value, c_count, c_value = jax.lax.while_loop(
            up_cond, up_body, (node, tree.d_count, tree.d_value, tree.c_count, tree.c_value))
        tree = tree._replace(d_count=d_count, d_value=d_value,
                             c_count=c_count, c_value=c_value)
        return tree, key

    tree, key = jax.lax.fori_loop(0, episodes, episode_fn, (tree, key))

    # plan = root selection rule only (reference: mcts_dpw.py:92-94):
    # best count, ties by value
    ch = tree.d_children[0]
    valid = ch >= 0
    ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) & valid[:, None]
    counts = jnp.where(valid, jnp.sum(jnp.where(ch_oh, tree.c_count[None, :], 0), axis=1), -1)
    cvals = jnp.sum(jnp.where(ch_oh, tree.c_value[None, :], 0.0), axis=1)
    tie = valid & (counts == jnp.max(counts))
    action = jnp.argmax(jnp.where(tie, cvals, -jnp.inf))
    return action, tree


class MCTSDPWAgent(MCTSAgent):
    """(reference: mcts_dpw.py:10-27)"""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({
            "budget": 100,
            "gamma": 0.95,
            "temperature": 1.0,
            "closed_loop": True,
            "k_state": 1.0,
            "alpha_state": 0.3,
            "k_action": 3.0,
            "alpha_action": 0.3,
            "max_next_states_count": 8,
        })
        return config

    def planner_plan(self, env, observation):
        functional = env.functional
        action, tree = mcts_dpw_plan(
            functional, env.params, env.state, self.next_key(), self.rollout_probs,
            num_actions=functional.action_space.n,
            episodes=int(self.config["episodes"]), horizon=int(self.config["horizon"]),
            gamma=float(self.config["gamma"]), temperature=float(self.config["temperature"]),
            k_action=float(self.config["k_action"]), alpha_action=float(self.config["alpha_action"]),
            k_state=float(self.config["k_state"]), alpha_state=float(self.config["alpha_state"]),
            width=int(self.config["max_next_states_count"]),
            closed_loop=bool(self.config["closed_loop"]))
        self.last_plan_data = tree
        return [int(action)]
