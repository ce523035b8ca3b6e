"""Graph-based optimistic planning (deterministic), array-encoded.

Rebuild of the reference planner (tree_search/graph_based.py:12-151): nodes
are aggregated by observation (a dense obs-key array replaces the
``planner.nodes`` str-keyed dict, graph_based.py:110-116); each expansion
simulates every action and records rewards/edges (graph_based.py:39-53);
value intervals [lower, upper] start at [0, 1/(1-gamma)] and are tightened by
value iteration.

The reference's queue-based asynchronous backup through parent sets
(graph_based.py:66-78) becomes masked *global* Bellman sweeps over all
expanded nodes until the residual drops below ``accuracy`` — the dense
formulation the reference itself sketches (graph_based_stochastic.py:272-330),
which converges to the same fixed point and maps to the hardware.

Loop-structure discipline (the r5 device bisection, docs/onehot.md): at
4096-tree batch the planner's wall time was NOT in the Bellman math — it was
the *sequential* control flow. The data-dependent descend ``while_loop``
(~0.46 ms per lockstep iteration under vmap) and the 5-step hash-table
insert scan together cost ~48 of the 51 ms/plan-batch. Both are gone:

* descend precomputes each node's greedy action ONCE per round (bounds are
  frozen during a descent, so the greedy successor map ``f`` is a fixed
  function) and follows ``f`` from the root for a *fixed* number of hops
  with unexpanded nodes absorbing — a lax.scan of one-hot selects, no
  data-dependent trip count;
* the obs-key hash table is a dense ``keys[N]`` array — at planner arena
  sizes (N <= a few hundred) an exact [A, N] compare beats linear probing,
  and all A inserts of a round resolve in ONE parallel pass (first
  occurrence wins for duplicate keys, fresh keys take consecutive slots in
  action order — identical node ids to the sequential insert).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key
from rl_agents_tpu.ops.onehot import onehot, select_row, select_row_tree


class Graph(NamedTuple):
    keys: Any          # [N] uint32 obs key per node slot (valid below `used`)
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

    The child one-hot compare is built INSIDE the sweep so XLA fuses
    broadcast-compare-select-reduce without materializing the [N, A, N]
    mask, and each bound gets its OWN [N, A, N] pass — stacking lower/upper
    on a trailing axis makes the fused intermediate [N, A, N, 2], whose
    size-2 minor dim wrecks the TPU tiling (docs/onehot.md)."""
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
        # decides when to stop tightening). Chunking 4 sweeps per check was
        # measured SLOWER at bench shapes (the overshoot sweeps cost more
        # than the saved iteration overhead, docs/onehot.md).
        mid = sweep(vals)
        new = sweep(mid)
        return new, jnp.max(jnp.abs(new - mid)), it + 2

    vals0 = jnp.stack([graph.value_lower, graph.value_upper], axis=1)
    vals, _, _ = jax.lax.while_loop(cond, body, (vals0, jnp.asarray(jnp.inf), 0))
    return graph._replace(value_lower=vals[:, 0], value_upper=vals[:, 1])


def _get_or_insert(keys, used, okeys):
    """Dense parallel get-or-insert of A obs keys into the node key array.

    Reproduces the sequential action-order insert exactly: an existing key
    resolves to its node; duplicate new keys within the round share the
    first occurrence's slot; distinct new keys take consecutive slots from
    ``used`` in action order (graph_based.py:110-116 semantics).

    Returns (keys, used, node_ids [A], fresh [A], slots [A])."""
    A = okeys.shape[0]
    N = keys.shape[0]
    in_use = jnp.arange(N) < used
    match = (keys[None, :] == okeys[:, None]) & in_use[None, :]      # [A, N]
    exists = jnp.any(match, axis=1)
    existing = jnp.argmax(match, axis=1).astype(jnp.int32)
    iota = jnp.arange(A)
    first_of = jnp.argmax(okeys[None, :] == okeys[:, None], axis=1)  # [A]
    dup = first_of < iota
    fresh = (~exists) & (~dup)
    offs = jnp.cumsum(fresh.astype(jnp.int32)) - fresh.astype(jnp.int32)
    slots = used + offs                                              # [A]
    node_ids = jnp.where(exists, existing, slots)
    # duplicates alias the first occurrence's id (one-hot select over A)
    first_ids = jnp.sum(
        jnp.where(jnp.arange(A)[None, :] == first_of[:, None],
                  node_ids[None, :], 0), axis=1)
    node_ids = jnp.where(dup & ~exists, first_ids, node_ids)
    P = fresh[None, :] & (jnp.arange(N)[:, None] == slots[None, :])  # [N, A]
    new_keys = jnp.where(
        jnp.any(P, axis=1),
        jnp.sum(jnp.where(P, okeys[None, :], jnp.uint32(0)), axis=1), keys)
    return new_keys, used + jnp.sum(fresh.astype(jnp.int32)), node_ids, fresh, slots


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions",
                                   "sampling_timeout", "capacity"))
def gbop_plan(env: FunctionalEnv, params, state0, obs0, key, num_actions: int,
              expansions: int, gamma: float, accuracy: float = 1e-2,
              sampling_timeout: int = 100, capacity: int = 0):
    A = num_actions
    # round the arena up to a multiple of 8 lanes: the dense [N, A, N]
    # contractions tile much better when the minor dim is aligned (extra
    # rows are inert — never key-matched)
    N = capacity or -((1 + expansions * A) // -8) * 8
    gamma = jnp.float32(gamma)
    vmax = 1.0 / (1.0 - gamma)

    # GROWING arenas: round r can hold at most 1 + (r+1)*A nodes, and the
    # dense [N_r, A, N_r] contractions (VI sweeps, descend Q-tables) cost
    # ~N_r^2 — the rounds are python-unrolled with the arena padded up on a
    # lane-aligned schedule instead of running every round at the final
    # size. Values/edges for rows beyond ``used`` are inert (children -1,
    # expanded False), so the computed bounds are IDENTICAL per round;
    # only the per-round gumbel draw shapes (and hence tie-breaks) differ
    # from a fixed-size arena.
    sizes = [min(-((1 + (r + 1) * A) // -8) * 8, N) for r in range(expansions)]

    def _grow(graph: Graph, new_n: int) -> Graph:
        def pad(x, fill):
            extra = jnp.full((new_n - x.shape[0],) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, extra], axis=0)

        return Graph(
            keys=pad(graph.keys, 0),
            expanded=pad(graph.expanded, False),
            value_lower=pad(graph.value_lower, 0.0),
            value_upper=pad(graph.value_upper, vmax),
            rewards=pad(graph.rewards, 0.0),
            children=pad(graph.children, -1),
            states=jax.tree.map(lambda a: pad(a, 0), graph.states),
            used=graph.used)

    N0 = sizes[0] if sizes else N
    states = jax.tree.map(
        lambda x: jnp.zeros((N0,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), state0)
    graph = Graph(
        keys=jnp.zeros((N0,), jnp.uint32).at[0].set(obs_key(obs0)),
        expanded=jnp.zeros((N0,), bool),
        value_lower=jnp.zeros((N0,)),
        value_upper=jnp.full((N0,), vmax),
        rewards=jnp.zeros((N0, A)),
        children=jnp.full((N0, A), -1, jnp.int32),
        states=states,
        used=jnp.ones((), jnp.int32),
    )
    # an acyclic optimistic descent visits at most the expanded-node count
    # (<= expansions) before absorbing at an unexpanded node; cyclic
    # descents stop wherever the cap lands, and re-expanding an expanded
    # node is a no-op — the same outcome as the reference's
    # sampling-timeout bailout (graph_based.py:96-108)
    walk_len = min(expansions, sampling_timeout)

    def descend(graph, k):
        """Optimistic sampling until an unexpanded node (graph_based.py:96-108).

        Bounds are frozen during a descent, so each node's greedy action —
        argmax of Q-upper with a uniform random tie-break, one gumbel draw
        per node per round — defines a fixed successor map ``f`` that the
        walk follows from the root with unexpanded nodes absorbing. A
        fixed-length scan of one-hot selects replaces the per-step
        while_loop (measured ~0.46 ms per lockstep vmapped iteration)."""
        Nr = graph.keys.shape[0]
        M, valid = _child_matrix(graph.children)
        q_up_all = _q_table(M, valid, graph.rewards, graph.value_upper, gamma,
                            1.0 / (1.0 - gamma))
        ties = q_up_all == jnp.max(q_up_all, axis=1, keepdims=True)
        g = jax.random.gumbel(k, (Nr, A))
        a_star = jnp.argmax(jnp.where(ties, g, -jnp.inf), axis=1)    # [Nr]
        succ = jnp.sum(
            jnp.where(jnp.arange(A)[None, :] == a_star[:, None],
                      graph.children, 0), axis=1)                    # [Nr]
        f = jnp.where(graph.expanded, succ, jnp.arange(Nr, dtype=jnp.int32))

        def walk(node, _):
            return jnp.sum(jnp.where(jnp.arange(Nr) == node, f, 0)), None

        node, _ = jax.lax.scan(walk, jnp.zeros((), jnp.int32), None,
                               length=walk_len)
        return node

    def expand(graph, node):
        """Simulate all actions; aggregate next states via the dense key
        array (graph_based.py:39-53). The heavy arenas (states [N, ...],
        rewards/children [N, A]) are each written ONCE per round."""
        Nr = graph.keys.shape[0]
        oh_node = onehot(node, Nr)
        state = select_row_tree(graph.states, oh_node)
        outs = jax.vmap(env.step, in_axes=(None, None, 0, None))(
            params, state, jnp.arange(A), jnp.zeros((2,), jnp.uint32))
        okeys = jax.vmap(obs_key)(outs.obs)                       # [A]

        keys, used, children_row, news_row, slots = _get_or_insert(
            graph.keys, graph.used, okeys)

        # one placement matrix P[n, a]: action a's next state lands in its
        # fresh slot, only when it created a node
        P = news_row[None, :] & (jnp.arange(Nr)[:, None] == slots[None, :])  # [Nr, A]
        row_new = jnp.any(P, axis=1)

        def place(arena, new):
            # arena [Nr, ...], new [A, ...] -> one masked rewrite. The f32
            # round-trip is exact for every state dtype here (bool 0/1,
            # small ints, f32), and exactly one P[n, :] entry is hot per row.
            # HIGHEST precision keeps the 0/1 selection exact on TPU (the
            # default matmul precision computes f32 dots in bf16, which
            # would round planner states — e.g. x ~ hundreds of meters).
            extra = (1,) * (arena.ndim - 1)
            placed = jnp.tensordot(P.astype(jnp.float32),
                                   new.astype(jnp.float32), axes=([1], [0]),
                                   precision=jax.lax.Precision.HIGHEST)
            return jnp.where(row_new.reshape((Nr,) + extra),
                             placed.astype(arena.dtype), arena)

        new_states = jax.tree.map(lambda arena, new: place(arena, new),
                                  graph.states, outs.state)
        oh_na = oh_node[:, None]  # [N, 1] broadcasts over the action axis
        return graph._replace(
            keys=keys,
            states=new_states,
            used=used,
            rewards=jnp.where(oh_na, outs.reward[None, :], graph.rewards),
            children=jnp.where(oh_na, children_row[None, :], graph.children),
            expanded=graph.expanded | oh_node)

    for r in range(expansions):
        if sizes[r] > graph.keys.shape[0]:
            graph = _grow(graph, sizes[r])
        key, kd = jax.random.split(key)
        node = descend(graph, kd)
        graph = expand(graph, node)
        graph = _value_iteration_sweeps(graph, gamma, accuracy)
    if graph.keys.shape[0] < N:
        graph = _grow(graph, N)

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
