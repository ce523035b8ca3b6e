"""Optimistic Planning for Deterministic systems (OPD), array-encoded.

Rebuild of the reference planner (tree_search/deterministic.py:9-139). The
reference's Python object tree with one env deep-copy per child
(deterministic.py:28-43, its dominant cost) becomes a fixed-capacity node
arena in device arrays plus a stacked env-state pytree; one expansion round =
masked argmax leaf selection + a vmapped env step over all actions + a
bounded backup walk. The whole ``plan`` is a single jitted program, and
``plan_batch`` vmaps it over thousands of trees (BASELINE config 4).

Bound math preserved exactly (deterministic.py:45-62):
    value_lower(child) = value_lower(parent) + gamma^(d-1) * r
    value_upper(child) = value_lower(child) + gamma^d / (1 - gamma)
    terminal children: both collapse to value_lower + terminal_reward * gamma^d/(1-gamma)
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent
from rl_agents_tpu.envs.base import FunctionalEnv


class OPDTree(NamedTuple):
    parent: Any        # [N] i32
    action: Any        # [N] i32 action from parent
    depth: Any         # [N] i32
    children: Any      # [N, A] i32, -1 when absent
    reward: Any        # [N] f32
    done: Any          # [N] bool
    value_lower: Any   # [N] f32
    value_upper: Any   # [N] f32
    leaf: Any          # [N] bool: allocated and unexpanded
    count: Any         # [N] i32 subtree visit counts
    used: Any          # [] i32 allocated node count
    states: Any        # env-state pytree stacked on a leading N axis


def _init_tree(env: FunctionalEnv, state0, capacity: int, num_actions: int) -> OPDTree:
    N, A = capacity, num_actions
    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), state0)
    return OPDTree(
        parent=jnp.full((N,), -1, jnp.int32),
        action=jnp.full((N,), -1, jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        reward=jnp.zeros((N,), jnp.float32),
        done=jnp.zeros((N,), bool),
        value_lower=jnp.zeros((N,), jnp.float32),
        value_upper=jnp.zeros((N,), jnp.float32),
        leaf=jnp.zeros((N,), bool).at[0].set(True),
        count=jnp.zeros((N,), jnp.int32).at[0].set(1),
        used=jnp.ones((), jnp.int32),
        states=states,
    )


def _backup_to_root(tree: OPDTree, node) -> OPDTree:
    """Recompute bounds as max over children up the parent chain
    (reference: deterministic.py:74-79)."""

    def cond(carry):
        n, _, _ = carry
        return n >= 0

    def body(carry):
        n, vl, vu = carry
        ch = tree.children[n]
        valid = ch >= 0
        cl = jnp.where(valid, vl[ch], -jnp.inf)
        cu = jnp.where(valid, vu[ch], -jnp.inf)
        vl = vl.at[n].set(jnp.max(cl))
        vu = vu.at[n].set(jnp.max(cu))
        return tree.parent[n], vl, vu

    _, vl, vu = jax.lax.while_loop(cond, body, (node, tree.value_lower, tree.value_upper))
    return tree._replace(value_lower=vl, value_upper=vu)


def _expand(env: FunctionalEnv, params, tree: OPDTree, leaf_idx, gamma, terminal_reward,
            num_actions: int) -> OPDTree:
    """Expand a leaf: step the env once per action (vmapped), write child
    stats, bump counts along the path (reference: deterministic.py:28-65)."""
    A = num_actions
    base = tree.used
    child_ids = base + jnp.arange(A, dtype=jnp.int32)
    leaf_state = jax.tree.map(lambda x: x[leaf_idx], tree.states)
    actions = jnp.arange(A)
    keys = jnp.zeros((A, 2), jnp.uint32)  # deterministic planner: null keys
    outs = jax.vmap(env.transition, in_axes=(None, None, 0, 0))(params, leaf_state, actions, keys)

    d = tree.depth[leaf_idx] + 1
    reward = outs.reward.astype(jnp.float32)
    done = outs.terminated | tree.done[leaf_idx]
    vl = tree.value_lower[leaf_idx] + gamma ** (d - 1).astype(jnp.float32) * reward
    vu = vl + gamma ** d.astype(jnp.float32) / (1 - gamma)
    terminal_value = vl + terminal_reward * gamma ** d.astype(jnp.float32) / (1 - gamma)
    vl = jnp.where(done, terminal_value, vl)
    vu = jnp.where(done, terminal_value, vu)

    states = jax.tree.map(
        lambda arena, new: jax.lax.dynamic_update_slice_in_dim(arena, new, base, axis=0),
        tree.states, outs.state)

    # count bump along the ancestor path (reference Node.update -> sequence())
    def bump_cond(carry):
        n, _ = carry
        return n >= 0

    def bump_body(carry):
        n, cnt = carry
        return tree.parent[n], cnt.at[n].add(A)

    _, count = jax.lax.while_loop(bump_cond, bump_body, (leaf_idx, tree.count))
    count = count.at[child_ids].set(1)

    return tree._replace(
        parent=tree.parent.at[child_ids].set(leaf_idx),
        action=tree.action.at[child_ids].set(actions),
        depth=tree.depth.at[child_ids].set(d),
        children=tree.children.at[leaf_idx].set(child_ids),
        reward=tree.reward.at[child_ids].set(reward),
        done=tree.done.at[child_ids].set(done),
        value_lower=tree.value_lower.at[child_ids].set(vl),
        value_upper=tree.value_upper.at[child_ids].set(vu),
        leaf=tree.leaf.at[leaf_idx].set(False).at[child_ids].set(True),
        count=count,
        used=tree.used + A,
        states=states,
    )


def _greedy_plan(tree: OPDTree, key, plan_capacity: int):
    """Greedy descent by value_lower with random tie-breaking
    (reference: deterministic.py:21-26, abstract.py:143-156)."""

    def body(carry, _):
        node, key, live = carry
        ch = tree.children[node]
        valid = ch >= 0
        has_children = jnp.any(valid)
        vals = jnp.where(valid, tree.value_lower[jnp.maximum(ch, 0)], -jnp.inf)
        m = jnp.max(vals)
        ties = valid & (vals == m)
        key, sub = jax.random.split(key)
        action = jax.random.categorical(sub, jnp.where(ties, 0.0, -jnp.inf))
        emit = live & has_children
        next_node = jnp.where(emit, ch[action], node)
        return (next_node, key, emit), jnp.where(emit, action, -1)

    (_, _, _), actions = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), key, jnp.asarray(True)), None, length=plan_capacity)
    length = jnp.sum(actions >= 0)
    return actions, length


@partial(jax.jit, static_argnames=("env", "num_actions", "expansions", "plan_capacity"))
def opd_plan(env: FunctionalEnv, params, state0, key, num_actions: int, expansions: int,
             gamma: float, terminal_reward: float = 0.0, plan_capacity: int = 32):
    """Full OPD plan as one device program (reference: deterministic.py:106-122):
    ``expansions`` rounds of [select optimistic leaf -> expand -> backup]."""
    capacity = 1 + expansions * num_actions
    tree = _init_tree(env, state0, capacity, num_actions)
    gamma = jnp.float32(gamma)
    terminal_reward = jnp.float32(terminal_reward)

    def round_fn(_, tree):
        scores = jnp.where(tree.leaf, tree.value_upper, -jnp.inf)
        leaf_idx = jnp.argmax(scores)  # first max == earliest-created leaf,
        # matching the reference's insertion-ordered max() tie-break
        tree = _expand(env, params, tree, leaf_idx, gamma, terminal_reward, num_actions)
        return _backup_to_root(tree, leaf_idx)

    tree = jax.lax.fori_loop(0, expansions, round_fn, tree)
    actions, length = _greedy_plan(tree, key, plan_capacity)
    return actions, length, tree


def opd_plan_batch(env: FunctionalEnv, params, states0, keys, num_actions: int,
                   expansions: int, gamma: float, terminal_reward: float = 0.0,
                   plan_capacity: int = 32):
    """vmap of opd_plan over a leading tree-batch axis of states/keys."""
    fn = partial(opd_plan, env, num_actions=num_actions, expansions=expansions,
                 gamma=gamma, terminal_reward=terminal_reward, plan_capacity=plan_capacity)
    return jax.vmap(lambda s, k: fn(params, s, k))(states0, keys)


class DeterministicPlannerAgent(AbstractTreeSearchAgent):
    """OPD agent (reference: deterministic.py:135-139)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({"budget": 100})
        return config

    def make_planner(self):
        pass  # the planner is the jitted opd_plan program, built per call signature

    def planner_plan(self, env, observation):
        functional = env.functional
        num_actions = functional.action_space.n
        expansions = max(int(self.config["budget"]) // num_actions, 1)
        actions, length, tree = opd_plan(
            functional, env.params, env.state, self.next_key(),
            num_actions=num_actions, expansions=expansions,
            gamma=float(self.config["gamma"]),
            terminal_reward=float(self.config["terminal_reward"]),
            plan_capacity=min(max(expansions, 1), 64),
        )
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)
