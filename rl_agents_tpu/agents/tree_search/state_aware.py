"""State-aware optimistic planning (OPD + state aggregation), array-encoded.

Rebuild of the reference planner (tree_search/state_aware.py:10-137): OPD
where all tree nodes observing the same state share a global state-value
upper-confidence bound (state_aware.py:74-86, the ``state_values`` dict —
here a hash table + value array). A node's UCB becomes
``value_lower + gamma^depth * state_value[obs]`` (state_aware.py:66-68).
The reference's queue backup through aggregated neighbours
(state_aware.py:43-64) becomes bounded global tightening sweeps: candidate
bounds are scatter-min'd into the state-value table until convergence.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.deterministic import DeterministicPlannerAgent
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.hashing import obs_key, table_init, table_lookup_or_insert
from rl_agents_tpu.ops.onehot import onehot, select_row, select_row_tree, set_row


class StateAwareTree(NamedTuple):
    parent: Any
    action: Any
    depth: Any
    children: Any      # [N, A]
    reward: Any
    done: Any
    value_lower: Any
    leaf: Any
    obs_id: Any        # [N] index into the state-value table arrays
    used: Any
    states: Any
    # global state aggregation
    table: Any         # HashTable: obs key -> state id
    state_values: Any  # [S] state-value UCBs


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions", "plan_capacity",
                                   "vi_sweeps"))
def state_aware_plan(env: FunctionalEnv, params, state0, obs0, key, num_actions: int,
                     expansions: int, gamma: float, terminal_reward: float = 0.0,
                     plan_capacity: int = 32, vi_sweeps: int = 10):
    A = num_actions
    N = 1 + expansions * A
    S = N  # at most one distinct state per node
    gamma = jnp.float32(gamma)
    vmax = 1.0 / (1.0 - gamma)

    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), state0)
    table, root_sid, _ = table_lookup_or_insert(table_init(2 * S), obs_key(obs0), 0)
    tree = StateAwareTree(
        parent=jnp.full((N,), -1, jnp.int32),
        action=jnp.full((N,), -1, jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        reward=jnp.zeros((N,)),
        done=jnp.zeros((N,), bool),
        value_lower=jnp.zeros((N,)),
        leaf=jnp.zeros((N,), bool).at[0].set(True),
        obs_id=jnp.zeros((N,), jnp.int32),
        used=jnp.ones((), jnp.int32),
        states=states,
        table=table,
        state_values=jnp.full((S,), vmax),
    )

    def node_ucb(tree):
        """value_lower + gamma^depth * state_value (state_aware.py:66-68).
        The sv gather is a dense masked reduction (one-hot discipline: a
        per-lane vector gather under vmap is the TPU pathology)."""
        sv_of = jnp.sum(jnp.where(
            tree.obs_id[:, None] == jnp.arange(S)[None, :],
            tree.state_values[None, :], 0.0), axis=1)
        return tree.value_lower + gamma ** tree.depth.astype(jnp.float32) * sv_of

    def expand(tree, leaf_idx, base):
        # ``base`` is the round-indexed slot base — identical across a
        # vmapped batch, so every child-block write is a cheap slice update
        # rather than a per-lane scatter (see deterministic.py:_expand)
        child_ids = base + jnp.arange(A, dtype=jnp.int32)
        oh_leaf = onehot(leaf_idx, N)
        leaf_state = select_row_tree(tree.states, oh_leaf)
        outs = jax.vmap(env.step, in_axes=(None, None, 0, None))(
            params, leaf_state, jnp.arange(A), jnp.zeros((2,), jnp.uint32))
        d = select_row(tree.depth, oh_leaf) + 1
        reward = outs.reward.astype(jnp.float32)
        done = outs.terminated | select_row(tree.done, oh_leaf)
        vl = select_row(tree.value_lower, oh_leaf) \
            + gamma ** (d - 1).astype(jnp.float32) * reward
        vl = jnp.where(done, vl + terminal_reward * gamma ** d.astype(jnp.float32) / (1 - gamma), vl)

        def register_obs(carry, a):
            table, state_values, sid_count, obs_ids = carry
            oh_a = onehot(a, A)
            okey = obs_key(select_row_tree(outs.obs, oh_a))
            table, sid, is_new = table_lookup_or_insert(table, okey, sid_count)
            sid_count = sid_count + is_new.astype(jnp.int32)
            # terminal states have zero value-to-go (state_aware.py:24-26)
            done_a = jnp.any(oh_a & done)
            state_values = jnp.where(onehot(sid, S) & done_a, 0.0, state_values)
            return (table, state_values, sid_count,
                    jnp.where(oh_a, sid, obs_ids)), None

        (table, state_values, sid_count, child_sids), _ = jax.lax.scan(
            register_obs, (tree.table, tree.state_values, tree.table.count,
                           jnp.zeros((A,), jnp.int32)), jnp.arange(A))

        def put(arena, rows):
            return jax.lax.dynamic_update_slice_in_dim(arena, rows, base, axis=0)

        new_states = jax.tree.map(put, tree.states, outs.state)
        return tree._replace(
            parent=put(tree.parent, jnp.full((A,), 0, jnp.int32) + leaf_idx),
            action=put(tree.action, jnp.arange(A, dtype=jnp.int32)),
            depth=put(tree.depth, jnp.broadcast_to(d, (A,))),
            children=set_row(tree.children, oh_leaf, child_ids),
            reward=put(tree.reward, reward),
            done=put(tree.done, done),
            value_lower=put(tree.value_lower, vl),
            leaf=put(tree.leaf, jnp.ones((A,), bool)) & ~oh_leaf,
            obs_id=put(tree.obs_id, child_sids),
            used=tree.used + A,
            states=new_states,
            table=table,
            state_values=state_values)

    def tighten(tree):
        """Global state-value tightening sweeps (replaces the reference's queue
        backup, state_aware.py:43-64): for every expanded node, the candidate
        bound max_a [r_child + gamma * sv(obs_child)] min-reduces into its
        state's value. All gathers/scatters are dense one-hot reductions;
        the child reward/obs tables are hoisted out of the sweep loop."""
        valid = tree.children >= 0
        M = (tree.children[:, :, None] == jnp.arange(N)[None, None, :]) \
            & valid[:, :, None]                                    # [N, A, N]
        child_reward = jnp.sum(jnp.where(M, tree.reward[None, None, :], 0.0), axis=2)
        child_obs = jnp.sum(jnp.where(M, tree.obs_id[None, None, :], 0), axis=2)
        expanded = jnp.any(valid, axis=1)
        node_to_state = tree.obs_id[:, None] == jnp.arange(S)[None, :]  # [N, S]

        def sweep(_, sv):
            sv_child = jnp.sum(jnp.where(
                child_obs[:, :, None] == jnp.arange(S)[None, None, :],
                sv[None, None, :], 0.0), axis=2)                   # [N, A]
            cand_children = child_reward + gamma * sv_child
            cand = jnp.max(jnp.where(valid, cand_children, -jnp.inf), axis=1)
            cand = jnp.where(expanded, cand, jnp.inf)
            cand_per_state = jnp.min(
                jnp.where(node_to_state, cand[:, None], jnp.inf), axis=0)
            return jnp.minimum(sv, cand_per_state)

        sv = jax.lax.fori_loop(0, vi_sweeps, sweep, tree.state_values)
        return tree._replace(state_values=sv)

    def round_fn(i, carry):
        tree = carry
        scores = jnp.where(tree.leaf, node_ucb(tree), -jnp.inf)
        leaf_idx = jnp.argmax(scores)
        tree = expand(tree, leaf_idx, 1 + i * A)
        return tighten(tree)

    tree = jax.lax.fori_loop(0, expansions, round_fn, tree)

    # plan: greedy descent by value_lower (inherited OPD selection rule)
    Mp = (tree.children[:, :, None] == jnp.arange(N)[None, None, :]) \
        & (tree.children >= 0)[:, :, None]
    child_vl = jnp.sum(jnp.where(Mp, tree.value_lower[None, None, :], 0.0), axis=2)

    def plan_body(carry, _):
        node, k, live = carry
        oh = onehot(node, N)
        ch = select_row(tree.children, oh)
        valid = ch >= 0
        vals = jnp.where(valid, select_row(child_vl, oh), -jnp.inf)
        ties = valid & (vals == jnp.max(vals))
        k, sub = jax.random.split(k)
        action = jax.random.categorical(sub, jnp.where(ties, 0.0, -jnp.inf))
        child = jnp.sum(jnp.where(jnp.arange(A) == action, ch, 0))
        emit = live & jnp.any(valid)
        return (jnp.where(emit, child, node), k, emit), jnp.where(emit, action, -1)

    (_, _, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), key, jnp.asarray(True)), None,
        length=plan_capacity)
    length = jnp.sum(actions >= 0)
    return actions, length, tree


class StateAwarePlannerAgent(DeterministicPlannerAgent):
    """(reference: state_aware.py:133-137)"""

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update({
            "backup_aggregated_nodes": True,
            "prune_suboptimal_leaves": True,
            "accuracy": 0,
        })
        return cfg

    def planner_plan(self, env, observation):
        functional = env.functional
        num_actions = functional.action_space.n
        expansions = max(int(self.config["budget"]) // num_actions, 1)
        obs0 = env.obs if env.obs is not None else observation
        actions, length, tree = state_aware_plan(
            functional, env.params, env.state, jax.tree.map(jnp.asarray, obs0),
            self.next_key(), num_actions=num_actions, expansions=expansions,
            gamma=float(self.config["gamma"]),
            terminal_reward=float(self.config["terminal_reward"]),
            plan_capacity=min(max(expansions, 1), 64))
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)
