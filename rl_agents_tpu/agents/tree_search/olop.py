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
            # expand when leaf (reference: olop.py:79-82)
            is_leaf = tree.children[node, 0] < 0
            base = tree.used
            child_ids = base + jnp.arange(A, dtype=jnp.int32)
            d = tree.depth[node] + 1
            tree = tree._replace(
                children=tree.children.at[node].set(
                    jnp.where(is_leaf, child_ids, tree.children[node])),
                parent=jnp.where(is_leaf, tree.parent.at[child_ids].set(node), tree.parent),
                depth=jnp.where(is_leaf, tree.depth.at[child_ids].set(d), tree.depth),
                value_upper=jnp.where(
                    is_leaf, tree.value_upper.at[child_ids].set(init_upper(d)),
                    tree.value_upper),
                used=tree.used + jnp.where(is_leaf, A, 0),
            )
            k, ka, ks = jax.random.split(k, 3)
            ch = tree.children[node]
            if continuation_uniform:
                random_action = jax.random.randint(ka, (), 0, A)
            else:
                random_action = jnp.zeros((), jnp.int32)
            ucb_action = jnp.argmax(tree.value_upper[jnp.maximum(ch, 0)])
            action = jnp.where(is_leaf, random_action, ucb_action)

            out = env.step(params, state, action, ks)
            child = ch[action]
            # node reward statistics update (reference: olop.py:132-142)
            done = out.terminated | tree.done[child]
            reward = jnp.where(done, 0.0, out.reward.astype(jnp.float32))
            cum = tree.cum_reward[child] + reward
            cnt = tree.count[child] + 1
            tree = tree._replace(
                cum_reward=tree.cum_reward.at[child].set(cum),
                count=tree.count.at[child].set(cnt),
                mu_ucb=tree.mu_ucb.at[child].set(reward_ucb(cum, cnt, episode)),
                done=tree.done.at[child].set(done),
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
            ch = tree.children[n]
            valid = ch >= 0
            has_children = jnp.any(valid)
            best_child = jnp.max(jnp.where(valid, vu[jnp.maximum(ch, 0)], -jnp.inf))
            new_v = jnp.where(has_children, tree.mu_ucb[n] + gamma * best_child, tree.mu_ucb[n])
            return tree.parent[n], vu.at[n].set(new_v)

        _, vu = jax.lax.while_loop(up_cond, up_body, (leaf, tree.value_upper))
        return tree._replace(value_upper=vu), key

    tree, key = jax.lax.fori_loop(0, episodes, episode_fn, (tree, key))

    # ---- plan extraction: best count, ties by value_upper (olop.py:126-130)
    def plan_body(carry, _):
        node, live = carry
        ch = tree.children[node]
        valid = ch >= 0
        chs = jnp.maximum(ch, 0)
        counts = jnp.where(valid, tree.count[chs], -1)
        tie = valid & (counts == jnp.max(counts))
        action = jnp.argmax(jnp.where(tie, tree.value_upper[chs], -jnp.inf))
        emit = live & jnp.any(valid)
        return (jnp.where(emit, ch[action], node), emit), jnp.where(emit, action, -1)

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
