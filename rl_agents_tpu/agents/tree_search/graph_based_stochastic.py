"""Stochastic graph-based optimistic planning (GBOP) with KL confidence sets.

Rebuild of the reference planner (tree_search/graph_based_stochastic.py:15-361):
decision nodes aggregated by observation; per-(s,a,s') reward KL bounds
(graph_based_stochastic.py:68-84); chance-node backups solve the constrained
max-expectation over the empirical next-state distribution for both value
bounds (graph_based_stochastic.py:167-198), with unobserved next-state slots
acting as placeholders bounded by ``max_next_states_count``
(graph_based_stochastic.py:146-150).

The reference notes a dormant dense "matrix_value_iteration" variant
(graph_based_stochastic.py:272-330) as the natural vectorised form — this is
that form: after each sampling episode, value bounds are tightened by masked
Bellman sweeps where every (state, action) solves its constrained-expectation
backup in a single vmapped kernel.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.common import allocation
from rl_agents_tpu.agents.tree_search.graph_based import GraphBasedPlannerAgent
from rl_agents_tpu.agents.tree_search.olop import parse_threshold
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key, table_init, table_lookup_or_insert
from rl_agents_tpu.ops.onehot import onehot, select_row, set_row
from rl_agents_tpu.utils.math import kl_upper_bound, max_expectation_under_constraint


class StochasticGraph(NamedTuple):
    table: Any          # HashTable: obs key -> node id
    visited: Any        # [N] bool: node has sampled actions
    value_lower: Any    # [N]
    value_upper: Any    # [N]
    n_count: Any        # [N] i32 N(s)
    c_count: Any        # [N, A] i32 N(s, a)
    sa_count: Any       # [N, A, W] i32 N(s, a, s')
    sa_cum_reward: Any  # [N, A, W]
    sa_mu_ucb: Any      # [N, A, W]
    sa_mu_lcb: Any      # [N, A, W]
    sa_keys: Any        # [N, A, W] uint32
    sa_child: Any       # [N, A, W] i32
    sa_n: Any           # [N, A] i32 slots filled
    states: Any
    used: Any


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon",
                                   "width", "vi_sweeps"))
def gbop_stochastic_plan(env: FunctionalEnv, params, state0, obs0, key,
                         num_actions: int, episodes: int, horizon: int, gamma: float,
                         accuracy: float, reward_threshold_coeff: float,
                         transition_threshold_coeff: float, width: int = 1,
                         vi_sweeps: int = 20):
    A, W, H = num_actions, width, horizon
    N = 2 + episodes * H
    gamma = jnp.float32(gamma)
    vmax = 1.0 / (1.0 - gamma)
    reward_threshold = reward_threshold_coeff * jnp.log(jnp.float32(episodes))
    transition_threshold = transition_threshold_coeff * jnp.log(jnp.float32(episodes))

    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), state0)
    table, _, _ = table_lookup_or_insert(table_init(2 * N), obs_key(obs0), 0)
    graph = StochasticGraph(
        table=table,
        visited=jnp.zeros((N,), bool),
        value_lower=jnp.zeros((N,)),
        value_upper=jnp.full((N,), vmax),
        n_count=jnp.zeros((N,), jnp.int32),
        c_count=jnp.zeros((N, A), jnp.int32),
        sa_count=jnp.zeros((N, A, W), jnp.int32),
        sa_cum_reward=jnp.zeros((N, A, W)),
        sa_mu_ucb=jnp.ones((N, A, W)),
        sa_mu_lcb=jnp.zeros((N, A, W)),
        sa_keys=jnp.zeros((N, A, W), jnp.uint32),
        sa_child=jnp.full((N, A, W), -1, jnp.int32),
        sa_n=jnp.zeros((N, A), jnp.int32),
        states=states,
        used=jnp.ones((), jnp.int32),
    )

    def _q_from_rows(c_cnt, sa_child, sa_count, mu_ucb, mu_lcb, vu, vl):
        """Constrained-expectation backup over leading batch dims
        (graph_based_stochastic.py:167-198). ``sa_child`` values are resolved
        densely via one-hot (per-lane child gathers are the TPU pathology,
        ops/onehot.py). Shapes: [..., W] rows, [...] counts."""
        cnt = c_cnt.astype(jnp.float32)
        filled = sa_child >= 0
        child_oh = (sa_child[..., None] == jnp.arange(N, dtype=jnp.int32)) \
            & filled[..., None]
        v_up = jnp.where(filled, jnp.sum(jnp.where(child_oh, vu, 0.0), axis=-1), vmax)
        v_lo = jnp.where(filled, jnp.sum(jnp.where(child_oh, vl, 0.0), axis=-1), 0.0)
        u_next = mu_ucb + gamma * v_up
        l_next = mu_lcb + gamma * v_lo
        p_hat = sa_count.astype(jnp.float32) / jnp.maximum(cnt, 1.0)[..., None]
        thr = transition_threshold / jnp.maximum(cnt, 1.0)
        flat = lambda x: x.reshape((-1,) + x.shape[x.ndim - 1:])
        p_plus = jax.vmap(max_expectation_under_constraint)(
            flat(u_next), flat(p_hat), thr.reshape(-1)).reshape(u_next.shape)
        p_minus = jax.vmap(max_expectation_under_constraint)(
            flat(-l_next), flat(p_hat), thr.reshape(-1)).reshape(l_next.shape)
        q_up = jnp.where(cnt > 0, jnp.sum(p_plus * u_next, axis=-1), vmax)
        q_lo = jnp.where(cnt > 0, jnp.sum(p_minus * l_next, axis=-1), 0.0)
        return q_up, q_lo

    def all_q_bounds(graph):
        return _q_from_rows(graph.c_count, graph.sa_child, graph.sa_count,
                            graph.sa_mu_ucb, graph.sa_mu_lcb,
                            graph.value_upper, graph.value_lower)

    def node_q_upper(graph, oh_n):
        """Q-upper row [A] for one node via one-hot row selects."""
        q_up, _ = _q_from_rows(
            select_row(graph.c_count, oh_n), select_row(graph.sa_child, oh_n),
            select_row(graph.sa_count, oh_n), select_row(graph.sa_mu_ucb, oh_n),
            select_row(graph.sa_mu_lcb, oh_n),
            graph.value_upper, graph.value_lower)
        return q_up

    def vi(graph):
        """Masked dense Bellman sweeps (the reference's matrix VI form)."""

        def cond(carry):
            lo, hi, delta, it = carry
            return (delta > accuracy) & (it < vi_sweeps)

        def body(carry):
            lo, hi, _, it = carry
            g = graph._replace(value_lower=lo, value_upper=hi)
            q_up, q_lo = all_q_bounds(g)
            new_hi = jnp.where(graph.visited, jnp.max(q_up, axis=1), hi)
            new_lo = jnp.where(graph.visited, jnp.max(q_lo, axis=1), lo)
            delta = jnp.maximum(jnp.max(jnp.abs(new_lo - lo)), jnp.max(jnp.abs(new_hi - hi)))
            return new_lo, new_hi, delta, it + 1

        lo, hi, _, _ = jax.lax.while_loop(
            cond, body, (graph.value_lower, graph.value_upper, jnp.asarray(jnp.inf), 0))
        return graph._replace(value_lower=lo, value_upper=hi)

    def episode_fn(carry, _):
        graph, key = carry
        key, kep = jax.random.split(key)

        def step_h(c, h):
            graph, state, obs, k = c
            okey = obs_key(obs)
            table, node, is_new = table_lookup_or_insert(graph.table, okey, graph.used)
            oh_used = onehot(graph.used, N) & is_new
            new_states = jax.tree.map(
                lambda arena, s: set_row(arena, oh_used, s),
                graph.states, state)
            graph = graph._replace(table=table, states=new_states,
                                   used=graph.used + is_new.astype(jnp.int32))
            node = jnp.maximum(node, 0)

            # optimistic sampling (graph_based_stochastic.py:42-51)
            k, ka, ks = jax.random.split(k, 3)
            oh_n = onehot(node, N)
            q_up = node_q_upper(graph, oh_n)
            ties = q_up == jnp.max(q_up)
            action = jax.random.categorical(ka, jnp.where(ties, 0.0, -jnp.inf))
            oh_a = onehot(action, A)
            oh_na = oh_n[:, None] & oh_a[None, :]

            out = env.step(params, state, action, ks)

            # next-state slot (graph_based_stochastic.py:207-219)
            nkey = obs_key(out.obs)
            keys_row = select_row(select_row(graph.sa_keys, oh_n), oh_a)
            nslots = jnp.sum(jnp.where(oh_na, graph.sa_n, 0))
            slots = jnp.arange(W)
            match = (keys_row == nkey) & (slots < nslots)
            exists = jnp.any(match)
            insert = (~exists) & (nslots < W)
            slot = jnp.where(exists, jnp.argmax(match), jnp.minimum(nslots, W - 1))

            # register next decision node globally
            table, nxt_node, nxt_new = table_lookup_or_insert(graph.table, nkey, graph.used)
            oh_used2 = onehot(graph.used, N) & nxt_new
            new_states = jax.tree.map(
                lambda arena, s: set_row(arena, oh_used2, s),
                graph.states, out.state)
            graph = graph._replace(table=table, states=new_states,
                                   used=graph.used + nxt_new.astype(jnp.int32))
            nxt_node = jnp.maximum(nxt_node, 0)

            # statistics updates (graph_based_stochastic.py:253-258), all as
            # dense one-hot masked blends over the [N, A, W] stat arrays
            oh_w = onehot(slot, W)
            oh_naw = oh_na[:, :, None] & oh_w[None, None, :]
            cnt = jnp.sum(jnp.where(oh_naw, graph.sa_count, 0)) + 1
            cum = jnp.sum(jnp.where(oh_naw, graph.sa_cum_reward, 0.0)) + out.reward
            graph = graph._replace(
                visited=graph.visited | oh_n,
                n_count=graph.n_count + oh_n.astype(jnp.int32),
                c_count=graph.c_count + oh_na.astype(jnp.int32),
                sa_keys=jnp.where(oh_naw & insert, nkey, graph.sa_keys),
                sa_child=jnp.where(oh_naw, nxt_node, graph.sa_child),
                sa_n=graph.sa_n + (oh_na & insert).astype(jnp.int32),
                sa_count=jnp.where(oh_naw, cnt, graph.sa_count),
                sa_cum_reward=jnp.where(oh_naw, cum, graph.sa_cum_reward),
                sa_mu_ucb=jnp.where(
                    oh_naw, kl_upper_bound(cum, cnt.astype(jnp.float32),
                                           reward_threshold), graph.sa_mu_ucb),
                sa_mu_lcb=jnp.where(
                    oh_naw, kl_upper_bound(cum, cnt.astype(jnp.float32),
                                           reward_threshold, lower=True),
                    graph.sa_mu_lcb))
            return (graph, out.state, out.obs, k), None

        (graph, _, _, _), _ = jax.lax.scan(
            step_h, (graph, state0, obs0, kep), jnp.arange(H))
        graph = vi(graph)
        return (graph, key), None

    (graph, key), _ = jax.lax.scan(episode_fn, (graph, key), None, length=episodes)

    # conservative plan at the root (graph_based.py:126-135 semantics)
    q_up, q_lo = all_q_bounds(graph)
    root_q = q_lo[0]
    ties = root_q == jnp.max(root_q)
    action = jax.random.categorical(key, jnp.where(ties, 0.0, -jnp.inf))
    return action, graph


class StochasticGraphBasedPlannerAgent(GraphBasedPlannerAgent):
    """(reference: graph_based_stochastic.py:346-361)"""

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update({
            "max_next_states_count": 1,
            "upper_bound": {
                "type": "kullback-leibler",
                "time": "global",
                "threshold": "1*np.log(time)",
                "transition_threshold": "0.1*np.log(time)",
            },
        })
        return cfg

    def make_planner(self):
        budget = max(self.env.action_space.n, self.config["budget"])
        self.config["episodes"], self.config["horizon"] = allocation(
            budget, self.config["gamma"])

    def planner_plan(self, env, observation):
        functional = env.functional
        obs0 = jax.tree.map(jnp.asarray, env.obs if env.obs is not None else observation)
        ub = self.config["upper_bound"]
        action, graph = gbop_stochastic_plan(
            functional, env.params, env.state, obs0, self.next_key(),
            num_actions=functional.action_space.n,
            episodes=int(self.config["episodes"]), horizon=int(self.config["horizon"]),
            gamma=float(self.config["gamma"]), accuracy=float(self.config["accuracy"]),
            reward_threshold_coeff=parse_threshold(ub.get("threshold", 1.0)),
            transition_threshold_coeff=parse_threshold(ub.get("transition_threshold", 0.1)),
            width=max(int(self.config["max_next_states_count"]), 1))
        self.last_plan_data = graph
        return [int(action)]
