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

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent, allocation
from rl_agents_tpu.agents.tree_search.mcts import MCTSAgent, _masked_random_argmax, make_prior_fn
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key


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
        """Action progressive widening (reference: mcts_dpw.py:106-127,139-154)."""
        n_children = tree.d_n_children[node]
        count = tree.d_count[node].astype(jnp.float32)
        widen = (n_children < A) & (k_action * count ** alpha_action >= n_children.astype(jnp.float32))

        k, ka, ks = jax.random.split(k, 3)
        # expand: random unexplored action
        unexplored = tree.d_children[node] < 0
        new_action = jax.random.categorical(ka, jnp.where(unexplored, 0.0, -jnp.inf))
        new_chance = tree.c_used
        # select: UCB over explored children
        ch = tree.d_children[node]
        explored = ch >= 0
        chs = jnp.maximum(ch, 0)
        c_count = jnp.maximum(tree.c_count[chs].astype(jnp.float32), 1e-6)
        ucb = tree.c_value[chs] + temperature * jnp.sqrt(
            jnp.log(jnp.maximum(count / c_count, 1.0)))
        sel_action = _masked_random_argmax(ks, ucb, explored)

        action = jnp.where(widen, new_action, sel_action)
        chance = jnp.where(widen, new_chance, ch[action])
        tree = tree._replace(
            d_children=jnp.where(widen, tree.d_children.at[node, action].set(new_chance),
                                 tree.d_children),
            d_n_children=tree.d_n_children + jnp.where(widen,
                                                       jnp.zeros_like(tree.d_n_children).at[node].set(1), 0),
            c_parent=jnp.where(widen, tree.c_parent.at[new_chance].set(node), tree.c_parent),
            c_action=jnp.where(widen, tree.c_action.at[new_chance].set(action), tree.c_action),
            c_used=tree.c_used + widen.astype(jnp.int32),
        )
        return tree, chance, action, k

    def chance_get_child(tree, chance, obs, k):
        """State progressive widening over hashed observations
        (reference: mcts_dpw.py:168-182)."""
        key_ = obs_key(obs) if closed_loop else jnp.uint32(1)
        keys_row = tree.c_child_keys[chance]
        n = tree.c_n_children[chance]
        slots = jnp.arange(W)
        match = (keys_row == key_) & (slots < n)
        exists = jnp.any(match)
        match_slot = jnp.argmax(match)

        count = tree.c_count[chance].astype(jnp.float32)
        can_widen = (n < W) & (k_state * count ** alpha_state >= n.astype(jnp.float32))
        k, kr = jax.random.split(k)
        random_slot = jax.random.randint(kr, (), 0, jnp.maximum(n, 1))

        new_decision = tree.d_used
        insert = (~exists) & can_widen
        slot = jnp.where(exists, match_slot, jnp.where(insert, n, random_slot))
        child = jnp.where(insert, new_decision, tree.c_children[chance, slot])
        tree = tree._replace(
            c_child_keys=jnp.where(insert, tree.c_child_keys.at[chance, slot].set(key_),
                                   tree.c_child_keys),
            c_children=jnp.where(insert, tree.c_children.at[chance, slot].set(new_decision),
                                 tree.c_children),
            c_n_children=tree.c_n_children + jnp.where(
                insert, jnp.zeros_like(tree.c_n_children).at[chance].set(1), 0),
            d_parent=jnp.where(insert, tree.d_parent.at[new_decision].set(chance),
                               tree.d_parent),
            d_used=tree.d_used + insert.astype(jnp.int32),
        )
        return tree, child, k

    def episode_fn(_, carry):
        tree, key = carry
        key, kd, kroll = jax.random.split(key, 3)

        def cond(c):
            tree, node, state, depth, total, terminal, k = c
            visited = (tree.d_count[node] != 0) | (node == 0)
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
            d_count = d_count.at[n].add(1)
            d_value = d_value.at[n].add((total - d_value[n]) / d_count[n].astype(jnp.float32))
            chance = tree.d_parent[n]

            def update_chance(args):
                chance, c_count, c_value = args
                c_count = c_count.at[chance].add(1)
                c_value = c_value.at[chance].add(
                    (total - c_value[chance]) / c_count[chance].astype(jnp.float32))
                return c_count, c_value

            c_count, c_value = jax.lax.cond(
                chance >= 0, update_chance, lambda a: (a[1], a[2]), (chance, c_count, c_value))
            nxt = jnp.where(chance >= 0, tree.c_parent[chance], -1)
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
    chs = jnp.maximum(ch, 0)
    counts = jnp.where(valid, tree.c_count[chs], -1)
    tie = valid & (counts == jnp.max(counts))
    action = jnp.argmax(jnp.where(tie, tree.c_value[chs], -jnp.inf))
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
