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

    def q_bounds_one(graph, n, a):
        """Constrained-expectation backup of one (s, a)
        (graph_based_stochastic.py:167-198)."""
        cnt = graph.c_count[n, a].astype(jnp.float32)
        filled = graph.sa_child[n, a] >= 0
        child = jnp.maximum(graph.sa_child[n, a], 0)
        v_up = jnp.where(filled, graph.value_upper[child], vmax)
        v_lo = jnp.where(filled, graph.value_lower[child], 0.0)
        u_next = graph.sa_mu_ucb[n, a] + gamma * v_up
        l_next = graph.sa_mu_lcb[n, a] + gamma * v_lo
        p_hat = graph.sa_count[n, a].astype(jnp.float32) / jnp.maximum(cnt, 1.0)
        thr = transition_threshold / jnp.maximum(cnt, 1.0)
        p_plus = max_expectation_under_constraint(u_next, p_hat, thr)
        p_minus = max_expectation_under_constraint(-l_next, p_hat, thr)
        q_up = jnp.where(cnt > 0, p_plus @ u_next, vmax)
        q_lo = jnp.where(cnt > 0, p_minus @ l_next, 0.0)
        return q_up, q_lo

    def all_q_bounds(graph):
        nn = jnp.repeat(jnp.arange(N), A)
        aa = jnp.tile(jnp.arange(A), N)
        q_up, q_lo = jax.vmap(lambda n, a: q_bounds_one(graph, n, a))(nn, aa)
        return q_up.reshape(N, A), q_lo.reshape(N, A)

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
            new_states = jax.tree.map(
                lambda arena, s: jnp.where(is_new, arena.at[graph.used].set(s), arena),
                graph.states, state)
            graph = graph._replace(table=table, states=new_states,
                                   used=graph.used + is_new.astype(jnp.int32))
            node = jnp.maximum(node, 0)

            # optimistic sampling (graph_based_stochastic.py:42-51)
            k, ka, ks = jax.random.split(k, 3)
            q_up = jax.vmap(lambda a: q_bounds_one(graph, node, a)[0])(jnp.arange(A))
            ties = q_up == jnp.max(q_up)
            action = jax.random.categorical(ka, jnp.where(ties, 0.0, -jnp.inf))

            out = env.step(params, state, action, ks)

            # next-state slot (graph_based_stochastic.py:207-219)
            nkey = obs_key(out.obs)
            keys_row = graph.sa_keys[node, action]
            nslots = graph.sa_n[node, action]
            slots = jnp.arange(W)
            match = (keys_row == nkey) & (slots < nslots)
            exists = jnp.any(match)
            insert = (~exists) & (nslots < W)
            slot = jnp.where(exists, jnp.argmax(match), jnp.minimum(nslots, W - 1))

            # register next decision node globally
            table, nxt_node, nxt_new = table_lookup_or_insert(graph.table, nkey, graph.used)
            new_states = jax.tree.map(
                lambda arena, s: jnp.where(nxt_new, arena.at[graph.used].set(s), arena),
                graph.states, out.state)
            graph = graph._replace(table=table, states=new_states,
                                   used=graph.used + nxt_new.astype(jnp.int32))
            nxt_node = jnp.maximum(nxt_node, 0)

            # statistics updates (graph_based_stochastic.py:253-258)
            cnt = graph.sa_count[node, action, slot] + 1
            cum = graph.sa_cum_reward[node, action, slot] + out.reward
            graph = graph._replace(
                visited=graph.visited.at[node].set(True),
                n_count=graph.n_count.at[node].add(1),
                c_count=graph.c_count.at[node, action].add(1),
                sa_keys=jnp.where(insert, graph.sa_keys.at[node, action, slot].set(nkey),
                                  graph.sa_keys),
                sa_child=graph.sa_child.at[node, action, slot].set(nxt_node),
                sa_n=graph.sa_n + jnp.where(
                    insert, jnp.zeros_like(graph.sa_n).at[node, action].set(1), 0),
                sa_count=graph.sa_count.at[node, action, slot].set(cnt),
                sa_cum_reward=graph.sa_cum_reward.at[node, action, slot].set(cum),
                sa_mu_ucb=graph.sa_mu_ucb.at[node, action, slot].set(
                    kl_upper_bound(cum, cnt.astype(jnp.float32), reward_threshold)),
                sa_mu_lcb=graph.sa_mu_lcb.at[node, action, slot].set(
                    kl_upper_bound(cum, cnt.astype(jnp.float32), reward_threshold,
                                   lower=True)))
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
