"""Graph-based optimistic planning (deterministic), array-encoded.

Rebuild of the reference planner (tree_search/graph_based.py:12-151): nodes
are aggregated by observation (a global obs-hash table replaces the
``planner.nodes`` str-keyed dict, graph_based.py:110-116); each expansion
simulates every action and records rewards/edges (graph_based.py:39-53);
value intervals [lower, upper] start at [0, 1/(1-gamma)] and are tightened by
value iteration.

The reference's queue-based asynchronous backup through parent sets
(graph_based.py:66-78) becomes masked *global* Bellman sweeps over all
expanded nodes until the residual drops below ``accuracy`` — the dense
formulation the reference itself sketches (graph_based_stochastic.py:272-330),
which converges to the same fixed point and maps to the hardware.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key, table_init, table_lookup_or_insert
from rl_agents_tpu.ops.onehot import onehot, select_row, select_row_tree, set_row


class Graph(NamedTuple):
    table: Any         # HashTable: obs key -> node id
    expanded: Any      # [N] bool
    value_lower: Any   # [N]
    value_upper: Any   # [N]
    rewards: Any       # [N, A]
    children: Any      # [N, A] i32
    states: Any        # stacked state pytree [N, ...]
    used: Any          # [] i32


def _child_matrix(children):
    """Dense child one-hot [N, A, N]: M[n, a, m] <=> children[n, a] == m.
    Turns every child-value gather into a masked reduction XLA streams at
    memory speed (the ``vals[children]`` form is a per-lane vector gather
    under vmap — the TPU pathology, see ops/onehot.py)."""
    N = children.shape[0]
    valid = children >= 0
    M = (children[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None, :]) \
        & valid[:, :, None]
    return M, valid


def _q_table(M, valid, rewards, vals, gamma, default):
    """Q[n, a] = r[n, a] + gamma * vals[children[n, a]] for every node at
    once (the dense matrix form the reference sketches at
    graph_based_stochastic.py:272-330)."""
    child_vals = jnp.sum(jnp.where(M, vals[None, None, :], 0.0), axis=2)
    return rewards + gamma * jnp.where(valid, child_vals, default)


def _value_iteration_sweeps(graph: Graph, gamma, accuracy, max_sweeps: int = 100):
    """Masked global Bellman sweeps until residual <= accuracy.

    Bandwidth discipline (this loop is the planner's HBM-traffic hot spot,
    see docs/onehot.md): the child one-hot compare is built INSIDE the sweep
    so XLA fuses broadcast-compare-select-reduce without materializing the
    [N, A, N] mask, and each bound gets its OWN [B, N, A, N] pass — stacking
    lower/upper on a trailing axis (the r4 form) made the fused intermediate
    [B, N, A, N, 2], whose size-2 minor dim wrecks the TPU tiling: measured
    0.945 ms/sweep vs 0.065 ms for two single-bound passes at B=4096, N=64
    (14.5x; the N>=48 bandwidth cliff in docs/onehot.md was entirely this)."""
    defaults = jnp.stack([jnp.zeros(()), 1.0 / (1.0 - gamma)])  # [2]
    N = graph.children.shape[0]

    def sweep(vals):
        """vals [N, 2] -> one Bellman application of both bounds."""
        M = graph.children[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None, :]
        valid = graph.children >= 0
        vs = []
        for k in range(2):  # lower, upper — one [N, A, N] contraction each
            child_vals = jnp.sum(jnp.where(M, vals[None, None, :, k], 0.0),
                                 axis=2)                           # [N, A]
            q = graph.rewards + gamma * jnp.where(valid, child_vals, defaults[k])
            vs.append(jnp.max(q, axis=1))
        v = jnp.stack(vs, axis=1)                                  # [N, 2]
        return jnp.where(graph.expanded[:, None], v, vals)

    def cond(carry):
        vals, delta, it = carry
        return (delta > accuracy) & (it < max_sweeps)

    def body(carry):
        vals, _, it = carry
        # two Bellman applications per loop iteration: halves the while_loop
        # per-iteration overhead; bounds converge monotonically to the same
        # accuracy fixed point (the residual check between sweeps only
        # decides when to stop tightening)
        mid = sweep(vals)
        new = sweep(mid)
        return new, jnp.max(jnp.abs(new - mid)), it + 2

    vals0 = jnp.stack([graph.value_lower, graph.value_upper], axis=1)
    vals, _, _ = jax.lax.while_loop(cond, body, (vals0, jnp.asarray(jnp.inf), 0))
    return graph._replace(value_lower=vals[:, 0], value_upper=vals[:, 1])


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions",
                                   "sampling_timeout", "capacity"))
def gbop_plan(env: FunctionalEnv, params, state0, obs0, key, num_actions: int,
              expansions: int, gamma: float, accuracy: float = 1e-2,
              sampling_timeout: int = 100, capacity: int = 0):
    A = num_actions
    # round the arena up to a multiple of 8 lanes: the dense [N, A, N]
    # contractions tile much better when the minor dim is aligned (extra
    # rows are inert — never inserted into the obs table)
    N = capacity or -((1 + expansions * A) // -8) * 8
    gamma = jnp.float32(gamma)

    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), state0)
    table, root, _ = table_lookup_or_insert(table_init(2 * N), obs_key(obs0), 0)
    graph = Graph(
        table=table,
        expanded=jnp.zeros((N,), bool),
        value_lower=jnp.zeros((N,)),
        value_upper=jnp.full((N,), 1.0 / (1.0 - gamma)),
        rewards=jnp.zeros((N, A)),
        children=jnp.full((N, A), -1, jnp.int32),
        states=states,
        used=jnp.ones((), jnp.int32),
    )

    def descend(graph, k):
        """Optimistic sampling until an unexpanded node (graph_based.py:96-108).
        Bounds are frozen during a descent, so the dense Q table is computed
        once and each step is a one-hot row select. The child one-hot is
        built inline so it fuses into the contraction (never materialized)."""
        M, valid = _child_matrix(graph.children)
        q_up_all = _q_table(M, valid, graph.rewards, graph.value_upper, gamma,
                            1.0 / (1.0 - gamma))

        def body(c):
            node, k, steps = c
            oh = onehot(node, N)
            q_upper = select_row(q_up_all, oh)
            ties = q_upper == jnp.max(q_upper)
            k, ks = jax.random.split(k)
            action = jax.random.categorical(ks, jnp.where(ties, 0.0, -jnp.inf))
            ch_row = select_row(graph.children, oh)
            child = jnp.sum(jnp.where(jnp.arange(A) == action, ch_row, 0))
            return child, k, steps + 1

        def cond(c):
            node, k, steps = c
            return jnp.any(onehot(node, N) & graph.expanded) & (steps < sampling_timeout)

        node, k, _ = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), k, 0))
        return node, k

    def expand(graph, node):
        """Simulate all actions; aggregate next states via the obs table
        (graph_based.py:39-53).

        Bandwidth discipline: the per-action pass touches only the table and
        scalar carries; the heavy arenas (states [N, ...], rewards/children
        [N, A]) are each written ONCE per round — the previous per-action
        masked rewrite streamed the full states arena A times per expansion
        (docs/onehot.md)."""
        oh_node = onehot(node, N)
        state = select_row_tree(graph.states, oh_node)
        outs = jax.vmap(env.step, in_axes=(None, None, 0, None))(
            params, state, jnp.arange(A), jnp.zeros((2,), jnp.uint32))
        okeys = jax.vmap(obs_key)(outs.obs)                       # [A]

        def per_action(carry, a):
            table, used, children_row, news_row = carry
            okey = jnp.sum(jnp.where(jnp.arange(A) == a, okeys, jnp.uint32(0)))
            table, child, is_new = table_lookup_or_insert(table, okey, used)
            children_row = jnp.where(jnp.arange(A) == a, child, children_row)
            news_row = news_row | ((jnp.arange(A) == a) & is_new)
            return (table, used + is_new.astype(jnp.int32), children_row,
                    news_row), None

        (table, used, children_row, news_row), _ = jax.lax.scan(
            per_action,
            (graph.table, graph.used, jnp.full((A,), -1, jnp.int32),
             jnp.zeros((A,), bool)),
            jnp.arange(A))

        # one placement matrix P[n, a]: action a's next state lands in slot
        # used_before + (# new actions before a), only when it created a node
        offsets = jnp.cumsum(news_row.astype(jnp.int32)) - news_row.astype(jnp.int32)
        slots = graph.used + offsets                              # [A]
        P = news_row[None, :] & (jnp.arange(N)[:, None] == slots[None, :])  # [N, A]
        row_new = jnp.any(P, axis=1)

        def place(arena, new):
            # arena [N, ...], new [A, ...] -> one masked rewrite. The f32
            # round-trip is exact for every state dtype here (bool 0/1,
            # small ints, f32), and exactly one P[n, :] entry is hot per row.
            # HIGHEST precision keeps the 0/1 selection exact on TPU (the
            # default matmul precision computes f32 dots in bf16, which
            # would round planner states — e.g. x ~ hundreds of meters).
            extra = (1,) * (arena.ndim - 1)
            placed = jnp.tensordot(P.astype(jnp.float32),
                                   new.astype(jnp.float32), axes=([1], [0]),
                                   precision=jax.lax.Precision.HIGHEST)
            return jnp.where(row_new.reshape((N,) + extra),
                             placed.astype(arena.dtype), arena)

        new_states = jax.tree.map(lambda arena, new: place(arena, new),
                                  graph.states, outs.state)
        oh_na = oh_node[:, None]  # [N, 1] broadcasts over the action axis
        return graph._replace(
            table=table,
            states=new_states,
            used=used,
            rewards=jnp.where(oh_na, outs.reward[None, :], graph.rewards),
            children=jnp.where(oh_na, children_row[None, :], graph.children),
            expanded=graph.expanded | oh_node)

    def round_fn(carry, _):
        graph, k = carry
        node, k = descend(graph, k)
        graph = expand(graph, node)
        graph = _value_iteration_sweeps(graph, gamma, accuracy)
        return (graph, k), None

    (graph, key), _ = jax.lax.scan(round_fn, (graph, key), None, length=expansions)

    # conservative plan: descend by lower-bound argmax (graph_based.py:126-135)
    M, valid = _child_matrix(graph.children)
    q_lo_all = _q_table(M, valid, graph.rewards, graph.value_lower, gamma, 0.0)

    def plan_body(carry, _):
        node, live = carry
        oh = onehot(node, N)
        has = jnp.any(oh & graph.expanded)
        q_lower = select_row(q_lo_all, oh)
        action = jnp.argmax(q_lower)  # first max, like the reference's max()
        ch_row = select_row(graph.children, oh)
        child = jnp.sum(jnp.where(jnp.arange(A) == action, ch_row, 0))
        emit = live & has
        return (jnp.where(emit, child, node), emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), jnp.asarray(True)), None,
        length=min(sampling_timeout, 64))
    length = jnp.sum(actions >= 0)
    return actions, length, graph


class GraphBasedPlannerAgent(AbstractTreeSearchAgent):
    """(reference: graph_based.py:141-151)"""

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update({"budget": 100, "sampling_timeout": 100, "accuracy": 1e-2})
        return cfg

    def make_planner(self):
        pass

    def planner_plan(self, env, observation):
        functional = env.functional
        A = functional.action_space.n
        expansions = max(int(self.config["budget"]) // A, 1)
        obs0 = env.obs if env.obs is not None else observation
        actions, length, graph = gbop_plan(
            functional, env.params, env.state, jax.tree.map(jnp.asarray, obs0),
            self.next_key(), num_actions=A, expansions=expansions,
            gamma=float(self.config["gamma"]), accuracy=float(self.config["accuracy"]),
            sampling_timeout=int(self.config["sampling_timeout"]))
        self.last_plan_data = graph
        return self.get_plan_list(actions, length)
