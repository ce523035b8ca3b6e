"""BRUE: Best Recommendation with Uniform Exploration, array-encoded.

Rebuild of the reference planner (tree_search/brue.py:11-123): uniform random
rollouts (brue.py:24-33); each rollout's transitions build a decision/chance
node chain keyed by observation hash, then a reversed update backs up
estimated returns ``r + gamma * estimate(next)`` where ``estimate`` follows
the best-value chance child and count-weighted random outcomes (brue.py:35-64).
The budget is counted in env steps (brue.py:66-71).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent, allocation
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key
from rl_agents_tpu.ops.onehot import onehot, select_row


class BRUETree(NamedTuple):
    # decision nodes (outcome nodes): reward stats
    d_count: Any      # [Nd] i32
    d_reward: Any     # [Nd] f32 mean reward R(s,a,s')
    d_children: Any   # [Nd, A] i32 chance ids
    d_depth: Any      # [Nd] i32
    # chance nodes: value stats + obs-keyed children
    c_count: Any      # [Nc] i32
    c_value: Any      # [Nc] f32 mean estimated return
    c_child_keys: Any  # [Nc, W] uint32
    c_children: Any   # [Nc, W] i32 decision ids
    c_n_children: Any  # [Nc] i32
    d_used: Any
    c_used: Any


@partial(jax.jit, static_argnames=("env", "num_actions", "budget", "horizon", "width"))
def brue_plan(env: FunctionalEnv, params, state0, key, num_actions: int, budget: int,
              horizon: int, gamma: float, width: int = 8):
    A, W, H = num_actions, width, horizon
    max_episodes = budget  # each episode consumes >= 1 step
    Nd = 1 + max_episodes * H
    Nc = 1 + max_episodes * H
    gamma = jnp.float32(gamma)

    tree = BRUETree(
        d_count=jnp.zeros((Nd,), jnp.int32),
        d_reward=jnp.zeros((Nd,)),
        d_children=jnp.full((Nd, A), -1, jnp.int32),
        d_depth=jnp.zeros((Nd,), jnp.int32),
        c_count=jnp.zeros((Nc,), jnp.int32),
        c_value=jnp.zeros((Nc,)),
        c_child_keys=jnp.zeros((Nc, W), jnp.uint32),
        c_children=jnp.full((Nc, W), -1, jnp.int32),
        c_n_children=jnp.zeros((Nc,), jnp.int32),
        d_used=jnp.ones((), jnp.int32),
        c_used=jnp.zeros((), jnp.int32),
    )

    def get_chance_child(tree, d_node, action):
        """decision -> chance by action (reference: brue.py:93-96). One-hot
        arena access throughout this planner (ops/onehot.py): per-lane scalar
        indexing under a tree-batch vmap is the TPU pathology."""
        oh_na = onehot(d_node, Nd)[:, None] & onehot(action, A)[None, :]
        existing = jnp.sum(jnp.where(oh_na, tree.d_children, 0))
        is_new = existing < 0
        new_id = tree.c_used
        chance = jnp.where(is_new, new_id, existing)
        tree = tree._replace(
            d_children=jnp.where(oh_na & is_new, new_id, tree.d_children),
            c_used=tree.c_used + is_new.astype(jnp.int32))
        return tree, chance

    def get_decision_child(tree, chance, obs, depth):
        """chance -> decision by observation key (reference: brue.py:113-116)."""
        key_ = obs_key(obs)
        oh_c = onehot(chance, Nc)
        keys_row = select_row(tree.c_child_keys, oh_c)
        children_row = select_row(tree.c_children, oh_c)
        n = select_row(tree.c_n_children, oh_c)
        slots = jnp.arange(W)
        match = (keys_row == key_) & (slots < n)
        exists = jnp.any(match)
        slot = jnp.where(exists, jnp.argmax(match), jnp.minimum(n, W - 1))
        insert = (~exists) & (n < W)
        new_id = tree.d_used
        oh_w = onehot(slot, W)
        existing_child = jnp.sum(jnp.where(oh_w, children_row, 0))
        child = jnp.where(insert, new_id, existing_child)
        oh_cw = oh_c[:, None] & oh_w[None, :]
        oh_new_d = onehot(new_id, Nd)
        tree = tree._replace(
            c_child_keys=jnp.where(oh_cw & insert, key_, tree.c_child_keys),
            c_children=jnp.where(oh_cw & insert, new_id, tree.c_children),
            c_n_children=tree.c_n_children + (oh_c & insert).astype(jnp.int32),
            d_depth=jnp.where(oh_new_d & insert, depth, tree.d_depth),
            d_used=tree.d_used + insert.astype(jnp.int32))
        return tree, child

    def estimate(tree, d_node, k):
        """Best-action / count-weighted-random-outcome walk (brue.py:52-64)."""

        def body(c, d):
            node, ret, live, k = c
            ch = select_row(tree.d_children, onehot(node, Nd))
            valid = ch >= 0
            has_children = jnp.any(valid)
            ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) \
                & valid[:, None]
            cvals = jnp.sum(jnp.where(ch_oh, tree.c_value[None, :], 0.0), axis=1)
            best_a = jnp.argmax(jnp.where(valid, cvals, -jnp.inf))
            best_chance = jnp.sum(jnp.where(jnp.arange(A) == best_a, ch, 0))
            oh_bc = onehot(jnp.maximum(best_chance, 0), Nc)
            bc_children = select_row(tree.c_children, oh_bc)
            bc_n = select_row(tree.c_n_children, oh_bc)
            cc_oh = (bc_children[:, None] == jnp.arange(Nd, dtype=jnp.int32)[None, :]) \
                & (bc_children >= 0)[:, None]
            cc_counts = jnp.sum(jnp.where(cc_oh, tree.d_count[None, :], 0), axis=1)
            counts = jnp.where(jnp.arange(W) < bc_n, cc_counts, 0)
            k, ks = jax.random.split(k)
            slot = jax.random.categorical(
                ks, jnp.where(counts > 0, jnp.log(counts.astype(jnp.float32)), -jnp.inf))
            nxt = jnp.sum(jnp.where(jnp.arange(W) == slot, bc_children, 0))
            ok = live & has_children & (bc_n > 0) & (nxt >= 0)
            r_nxt = jnp.sum(jnp.where(onehot(jnp.maximum(nxt, 0), Nd), tree.d_reward, 0.0))
            ret = ret + jnp.where(ok, gamma ** d.astype(jnp.float32) * r_nxt, 0.0)
            return (jnp.where(ok, nxt, node), ret, ok, k), None

        (_, ret, _, _), _ = jax.lax.scan(
            body, (d_node, jnp.zeros(()), jnp.asarray(True), k),
            jnp.arange(H))
        return ret

    def episode_fn(carry, _):
        tree, budget_left, key = carry
        key, kroll = jax.random.split(key)
        active = budget_left > 0

        # ---- uniform rollout, recording the visited chain --------------
        def roll_body(c, h):
            state, terminal, k = c
            k, ka, ks = jax.random.split(k, 3)
            action = jax.random.randint(ka, (), 0, A)
            out = env.step(params, state, action, ks)
            live = ~terminal
            return (out.state, terminal | out.terminated, k), (
                action, out.reward, out.obs, live)

        (_, _, _), (actions, rewards, observations, lives) = jax.lax.scan(
            roll_body, (state0, jnp.zeros((), bool), kroll), jnp.arange(H))
        steps_used = jnp.sum(lives.astype(jnp.int32))

        # ---- build/lookup the node chain -------------------------------
        def chain_body(c, h):
            tree, node = c
            live = lives[h] & active

            def do(tree_node):
                tree, node = tree_node
                tree, chance = get_chance_child(tree, node, actions[h])
                obs_h = jax.tree.map(lambda x: x[h], observations)
                tree, nxt = get_decision_child(tree, chance, obs_h, h + 1)
                return (tree, nxt), (chance, nxt)

            (tree, nxt), (chance, next_node) = jax.lax.cond(
                live, do, lambda tn: (tn, (jnp.int32(-1), tn[1])), (tree, node))
            return (tree, nxt), (node, chance, next_node, live)

        (tree, _), (path_nodes, path_chances, path_next, path_live) = jax.lax.scan(
            chain_body, (tree, jnp.zeros((), jnp.int32)), jnp.arange(H))

        # ---- reversed update (reference: brue.py:47-51) ----------------
        def update_body(c, h):
            tree, key = c
            hh = H - 1 - h
            live = path_live[hh]

            def do(tk):
                tree, key = tk
                chance, nxt = path_chances[hh], path_next[hh]
                r = rewards[hh]
                oh_nxt = onehot(nxt, Nd)
                d_count = tree.d_count + oh_nxt.astype(jnp.int32)
                cnt = jnp.sum(jnp.where(oh_nxt, d_count, 0)).astype(jnp.float32)
                r_old = jnp.sum(jnp.where(oh_nxt, tree.d_reward, 0.0))
                d_reward = jnp.where(oh_nxt, (cnt - 1) / cnt * r_old + r / cnt,
                                     tree.d_reward)
                tree = tree._replace(d_count=d_count, d_reward=d_reward)
                key, ke = jax.random.split(key)
                est = r + gamma * estimate(tree, nxt, ke)
                oh_ch = onehot(chance, Nc)
                c_count = tree.c_count + oh_ch.astype(jnp.int32)
                ccnt = jnp.sum(jnp.where(oh_ch, c_count, 0)).astype(jnp.float32)
                v_old = jnp.sum(jnp.where(oh_ch, tree.c_value, 0.0))
                c_value = jnp.where(oh_ch, (ccnt - 1) / ccnt * v_old + est / ccnt,
                                    tree.c_value)
                return tree._replace(c_count=c_count, c_value=c_value), key

            tree, key = jax.lax.cond(live, do, lambda tk: tk, (tree, key))
            return (tree, key), None

        (tree, key), _ = jax.lax.scan(update_body, (tree, key), jnp.arange(H))

        budget_left = budget_left - jnp.where(active, jnp.maximum(steps_used, 1), 0)
        return (tree, budget_left, key), None

    (tree, _, _), _ = jax.lax.scan(
        episode_fn, (tree, jnp.int32(budget), key), None, length=max_episodes)

    # recommendation: argmax chance value at root (reference: brue.py:88-91)
    ch = tree.d_children[0]
    valid = ch >= 0
    ch_oh = (ch[:, None] == jnp.arange(Nc, dtype=jnp.int32)[None, :]) & valid[:, None]
    vals = jnp.where(valid,
                     jnp.sum(jnp.where(ch_oh, tree.c_value[None, :], 0.0), axis=1),
                     -jnp.inf)
    ties = valid & (vals == jnp.max(vals))
    action = jax.random.categorical(key, jnp.where(ties, 0.0, -jnp.inf))
    return action, tree


class BRUEAgent(AbstractTreeSearchAgent):
    """(reference: brue.py:119-123)"""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({"budget": 100, "max_next_states_count": 8})
        return config

    def make_planner(self):
        budget = max(self.env.action_space.n, self.config["budget"])
        self.config["episodes"], self.config["horizon"] = allocation(
            budget, self.config["gamma"])

    def planner_plan(self, env, observation):
        functional = env.functional
        action, tree = brue_plan(
            functional, env.params, env.state, self.next_key(),
            num_actions=functional.action_space.n, budget=int(self.config["budget"]),
            horizon=int(self.config["horizon"]), gamma=float(self.config["gamma"]),
            width=int(self.config["max_next_states_count"]))
        self.last_plan_data = tree
        return [int(action)]
