"""Open-Loop Optimistic Planning (OLOP / KL-OLOP), array-encoded.

Rebuild of the reference planner (tree_search/olop.py:11-200): budget split
into M episodes of horizon L (olop.py:50-62); each episode descends the
action-sequence tree by maximal B-value, expanding leaves on the way, updates
per-node reward upper confidence bounds, then backs sequence B-values
``value_upper = mu_ucb + gamma * max(children)`` to the root (olop.py:182-193).

The KL-UCB solve (reference: per-node host Newton via utils.py:123-147) is the
jnp fixed-iteration solver from utils/math.py, evaluated in-graph per update.
Structured upper-bound config replaces the reference's ``eval``'d threshold
strings (olop.py:160; strings like "4*np.log(time)" are still parsed, safely).
"""
from __future__ import annotations

import re
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent, allocation
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.onehot import onehot, select_row
from rl_agents_tpu.utils.math import kl_upper_bound


def parse_threshold(spec, default_coeff: float = 4.0) -> float:
    """Parse a threshold spec: a number, or the reference's legacy
    "<c>*np.log(time)" string form (no eval)."""
    if isinstance(spec, (int, float)):
        return float(spec)
    if isinstance(spec, str):
        m = re.fullmatch(r"\s*([\d.]+)\s*\*\s*np\.log\(\s*time\s*\)\s*", spec)
        if m:
            return float(m.group(1))
        raise ValueError(f"Unsupported threshold spec {spec!r}; use a coefficient c for c*log(time)")
    return default_coeff


class OLOPTree(NamedTuple):
    parent: Any       # [N] i32
    children: Any     # [N, A] i32
    depth: Any        # [N] i32
    count: Any        # [N] i32
    cum_reward: Any   # [N] f32
    mu_ucb: Any       # [N] f32
    value_upper: Any  # [N] f32  (sequence B-value)
    done: Any         # [N] bool
    used: Any         # [] i32


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon",
                                   "ucb_type", "time_global", "continuation_uniform"))
def olop_plan(env: FunctionalEnv, params, state0, key, num_actions: int, episodes: int,
              horizon: int, gamma: float, threshold_coeff: float,
              ucb_type: str = "kullback-leibler", time_global: bool = True,
              continuation_uniform: bool = False):
    A, H = num_actions, horizon
    N = 1 + episodes * H * A
    gamma = jnp.float32(gamma)

    def init_upper(depth):
        return (1 - gamma ** (H + 1 - depth).astype(jnp.float32)) / (1 - gamma)

    mu_init = jnp.float32(1.0 if ucb_type == "kullback-leibler" else jnp.inf)
    tree = OLOPTree(
        parent=jnp.full((N,), -1, jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        count=jnp.zeros((N,), jnp.int32),
        cum_reward=jnp.zeros((N,), jnp.float32),
        mu_ucb=jnp.full((N,), mu_init),
        value_upper=jnp.zeros((N,), jnp.float32).at[0].set(init_upper(jnp.zeros((), jnp.int32))),
        done=jnp.zeros((N,), bool),
        used=jnp.ones((), jnp.int32),
    )

    def reward_ucb(cum, count, episode):
        time = jnp.float32(episodes) if time_global else episode.astype(jnp.float32) + 1
        threshold = threshold_coeff * jnp.log(time)
        if ucb_type == "kullback-leibler":
            return kl_upper_bound(cum, count.astype(jnp.float32), threshold, eps=1e-2)
        # hoeffding: mu + sqrt(threshold / (2 n)) (the classic bound; the
        # reference's hoeffding branch is dormant, olop.py:153-158)
        mu = cum / jnp.maximum(count.astype(jnp.float32), 1.0)
        bound = mu + jnp.sqrt(threshold / (2.0 * jnp.maximum(count.astype(jnp.float32), 1.0)))
        return jnp.where(count == 0, jnp.inf, bound)

    def episode_fn(episode, carry):
        tree, key = carry
        key, kep = jax.random.split(key)

        # ---- descend one action sequence, expanding as needed -----------
        def step_h(carry, h):
            tree, node, state, k = carry
            # expand when leaf (reference: olop.py:79-82). All arena access
            # is one-hot masked (ops/onehot.py): per-lane scalar indexing
            # under a tree-batch vmap is the TPU pathology.
            oh_node = onehot(node, N)
            ch0 = select_row(tree.children, oh_node)
            is_leaf = ch0[0] < 0
            base = tree.used
            child_ids = base + jnp.arange(A, dtype=jnp.int32)
            iota_n = jnp.arange(N, dtype=jnp.int32)
            oh_blk = (iota_n >= base) & (iota_n < base + A) & is_leaf
            d = select_row(tree.depth, oh_node) + 1
            tree = tree._replace(
                children=jnp.where(oh_node[:, None] & is_leaf,
                                   child_ids[None, :], tree.children),
                parent=jnp.where(oh_blk, node, tree.parent),
                depth=jnp.where(oh_blk, d, tree.depth),
                value_upper=jnp.where(oh_blk, init_upper(d), tree.value_upper),
                used=tree.used + jnp.where(is_leaf, A, 0),
            )
            k, ka, ks = jax.random.split(k, 3)
            ch = select_row(tree.children, oh_node)
            if continuation_uniform:
                random_action = jax.random.randint(ka, (), 0, A)
            else:
                random_action = jnp.zeros((), jnp.int32)
            ch_oh = (ch[:, None] == iota_n[None, :]) & (ch >= 0)[:, None]
            child_vu = jnp.sum(jnp.where(ch_oh, tree.value_upper[None, :], 0.0), axis=1)
            ucb_action = jnp.argmax(jnp.where(ch >= 0, child_vu, -jnp.inf))
            action = jnp.where(is_leaf, random_action, ucb_action)

            out = env.step(params, state, action, ks)
            child = jnp.sum(jnp.where(jnp.arange(A) == action, ch, 0))
            oh_child = onehot(child, N)
            # node reward statistics update (reference: olop.py:132-142)
            done = out.terminated | jnp.any(oh_child & tree.done)
            reward = jnp.where(done, 0.0, out.reward.astype(jnp.float32))
            cum = select_row(tree.cum_reward, oh_child) + reward
            cnt = select_row(tree.count, oh_child) + 1
            tree = tree._replace(
                cum_reward=jnp.where(oh_child, cum, tree.cum_reward),
                count=jnp.where(oh_child, cnt, tree.count),
                mu_ucb=jnp.where(oh_child, reward_ucb(cum, cnt, episode), tree.mu_ucb),
                done=tree.done | (oh_child & done),
            )
            return (tree, child, out.state, k), child

        (tree, leaf, _, _), _ = jax.lax.scan(
            step_h, (tree, jnp.zeros((), jnp.int32), state0, kep), jnp.arange(H))

        # ---- backup B-values to root (reference: olop.py:182-193) -------
        def up_cond(c):
            n, _ = c
            return n >= 0

        def up_body(c):
            n, vu = c
            oh_n = onehot(n, N)
            ch = select_row(tree.children, oh_n)
            valid = ch >= 0
            has_children = jnp.any(valid)
            ch_oh = (ch[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]) \
                & valid[:, None]
            child_vu = jnp.sum(jnp.where(ch_oh, vu[None, :], 0.0), axis=1)
            best_child = jnp.max(jnp.where(valid, child_vu, -jnp.inf))
            mu_n = select_row(tree.mu_ucb, oh_n)
            new_v = jnp.where(has_children, mu_n + gamma * best_child, mu_n)
            return select_row(tree.parent, oh_n), jnp.where(oh_n, new_v, vu)

        _, vu = jax.lax.while_loop(up_cond, up_body, (leaf, tree.value_upper))
        return tree._replace(value_upper=vu), key

    tree, key = jax.lax.fori_loop(0, episodes, episode_fn, (tree, key))

    # ---- plan extraction: best count, ties by value_upper (olop.py:126-130)
    def plan_body(carry, _):
        node, live = carry
        oh = onehot(node, N)
        ch = select_row(tree.children, oh)
        valid = ch >= 0
        ch_oh = (ch[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]) & valid[:, None]
        counts = jnp.where(valid,
                           jnp.sum(jnp.where(ch_oh, tree.count[None, :], 0), axis=1), -1)
        cvu = jnp.sum(jnp.where(ch_oh, tree.value_upper[None, :], 0.0), axis=1)
        tie = valid & (counts == jnp.max(counts))
        action = jnp.argmax(jnp.where(tie, cvu, -jnp.inf))
        child = jnp.sum(jnp.where(jnp.arange(A) == action, ch, 0))
        emit = live & jnp.any(valid)
        return (jnp.where(emit, child, node), emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), jnp.asarray(True)), None, length=horizon)
    length = jnp.sum(actions >= 0)
    return actions, length, tree


class OLOPAgent(AbstractTreeSearchAgent):
    """OLOP / KL-OLOP agent (reference: olop.py:196-200)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({
            "budget": 100,
            "upper_bound": {
                "type": "kullback-leibler",
                "time": "global",
                "threshold": "4*np.log(time)",
            },
            "continuation_type": "zeros",
        })
        return config

    def make_planner(self):
        budget = max(self.env.action_space.n, self.config["budget"])
        self.config["episodes"], self.config["horizon"] = allocation(
            budget, self.config["gamma"])

    def planner_plan(self, env, observation):
        functional = env.functional
        ub = self.config["upper_bound"]
        actions, length, tree = olop_plan(
            functional, env.params, env.state, self.next_key(),
            num_actions=functional.action_space.n,
            episodes=int(self.config["episodes"]), horizon=int(self.config["horizon"]),
            gamma=float(self.config["gamma"]),
            threshold_coeff=parse_threshold(ub.get("threshold", 4.0)),
            ucb_type=ub.get("type", "kullback-leibler"),
            time_global=(ub.get("time", "global") == "global"),
            continuation_uniform=(self.config["continuation_type"] == "uniform"))
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)
