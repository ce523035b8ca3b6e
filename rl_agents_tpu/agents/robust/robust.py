"""Robust planning over finite model ensembles.

Rebuild of the reference (robust/robust.py:9-108):

* DROP (DiscreteRobustPlannerAgent): OPD over a JointEnv stepping N model
  variants in lockstep, with node bounds = min over the model axis
  (robust.py:42-50). Here the ensemble is a leading model axis on the env
  params/state pytrees, stepped by vmap inside the same single-program OPD
  arena kernel — node stats carry an [N, M] model axis (SURVEY §2.8 P4/P5).
* IRP (IntervalRobustPlannerAgent): wraps a sub-agent planning in an env
  preprocessed to propagate state intervals with pessimistic rewards
  (robust.py:74-108) — pure delegation.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.onehot import onehot, select_row, select_row_tree
from rl_agents_tpu.factory import load_agent, preprocess_env


class RobustTree(NamedTuple):
    parent: Any        # [N] i32
    action: Any        # [N] i32
    depth: Any         # [N] i32
    children: Any      # [N, A] i32
    reward: Any        # [N, M]
    done: Any          # [N, M]
    value_lower: Any   # [N, M]
    value_upper: Any   # [N, M]
    leaf: Any          # [N] bool
    used: Any          # [] i32
    states: Any        # env-state pytree stacked [N, M, ...]


@partial(jax.jit, static_argnames=("env", "num_actions", "num_models", "expansions",
                                   "plan_capacity"))
def robust_opd_plan(env: FunctionalEnv, params_ensemble, states0, key, num_actions: int,
                    num_models: int, expansions: int, gamma: float,
                    terminal_reward: float = 0.0, plan_capacity: int = 32):
    """OPD with vector node values over M models; selection/backup aggregate
    with min over models (reference RobustNode, robust.py:42-50).

    ``params_ensemble``: env params with a leading [M] axis.
    ``states0``: initial env state with a leading [M] axis.
    """
    A, M = num_actions, num_models
    N = 1 + expansions * A
    gamma = jnp.float32(gamma)
    terminal_reward = jnp.float32(terminal_reward)

    states = jax.tree.map(
        lambda x: jnp.zeros((N,) + jnp.shape(x), jnp.asarray(x).dtype).at[0].set(x), states0)
    tree = RobustTree(
        parent=jnp.full((N,), -1, jnp.int32),
        action=jnp.full((N,), -1, jnp.int32),
        depth=jnp.zeros((N,), jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        reward=jnp.zeros((N, M)),
        done=jnp.zeros((N, M), bool),
        value_lower=jnp.zeros((N, M)),
        value_upper=jnp.zeros((N, M)),
        leaf=jnp.zeros((N,), bool).at[0].set(True),
        used=jnp.ones((), jnp.int32),
        states=states,
    )

    step_ma = jax.vmap(jax.vmap(env.transition, in_axes=(0, 0, None, None)),  # over models
                       in_axes=(None, None, 0, None))                   # over actions

    def expand(tree, leaf_idx):
        # one-hot arena access (ops/onehot.py): keeps a tree-batch vmap of
        # this program off the per-lane gather path
        base = tree.used
        child_ids = base + jnp.arange(A, dtype=jnp.int32)
        oh_leaf = onehot(leaf_idx, N)
        leaf_states = select_row_tree(tree.states, oh_leaf)            # [M, ...]
        outs = step_ma(params_ensemble, leaf_states, jnp.arange(A),
                       jnp.zeros((2,), jnp.uint32))  # [A, M, ...]
        d = select_row(tree.depth, oh_leaf) + 1
        reward = outs.reward.astype(jnp.float32)                       # [A, M]
        done = outs.terminated | select_row(tree.done, oh_leaf)[None]
        vl = select_row(tree.value_lower, oh_leaf)[None] + gamma ** (d - 1).astype(jnp.float32) * reward
        vu = vl + gamma ** d.astype(jnp.float32) / (1 - gamma)
        tv = vl + terminal_reward * gamma ** d.astype(jnp.float32) / (1 - gamma)
        vl = jnp.where(done, tv, vl)
        vu = jnp.where(done, tv, vu)
        new_states = jax.tree.map(
            lambda arena, new: jax.lax.dynamic_update_slice_in_dim(arena, new, base, axis=0),
            tree.states, outs.state)
        return tree._replace(
            parent=tree.parent.at[child_ids].set(leaf_idx),
            action=tree.action.at[child_ids].set(jnp.arange(A)),
            depth=tree.depth.at[child_ids].set(d),
            children=tree.children.at[leaf_idx].set(child_ids),
            reward=tree.reward.at[child_ids].set(reward),
            done=tree.done.at[child_ids].set(done),
            value_lower=tree.value_lower.at[child_ids].set(vl),
            value_upper=tree.value_upper.at[child_ids].set(vu),
            leaf=tree.leaf.at[leaf_idx].set(False).at[child_ids].set(True),
            used=tree.used + A,
            states=new_states)

    def backup(tree, node):
        """Backup scalar min-over-model bounds (broadcast over the model axis),
        matching RobustNode semantics: internal nodes hold aggregated values."""

        def cond(c):
            n, _, _ = c
            return n >= 0

        def body(c):
            n, vl, vu = c
            oh_n = onehot(n, N)
            ch = select_row(tree.children, oh_n)
            valid = ch >= 0
            ch_oh = (ch[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]) \
                & valid[:, None]                                       # [A, N]
            child_vl = jnp.sum(jnp.where(ch_oh[:, :, None], vl[None, :, :], 0.0), axis=1)
            child_vu = jnp.sum(jnp.where(ch_oh[:, :, None], vu[None, :, :], 0.0), axis=1)
            cl = jnp.where(valid, jnp.min(child_vl, axis=-1), -jnp.inf)
            cu = jnp.where(valid, jnp.min(child_vu, axis=-1), -jnp.inf)
            vl = jnp.where(oh_n[:, None], jnp.max(cl), vl)
            vu = jnp.where(oh_n[:, None], jnp.max(cu), vu)
            return select_row(tree.parent, oh_n), vl, vu

        _, vl, vu = jax.lax.while_loop(cond, body, (node, tree.value_lower, tree.value_upper))
        return tree._replace(value_lower=vl, value_upper=vu)

    def round_fn(_, tree):
        scores = jnp.where(tree.leaf, jnp.min(tree.value_upper, axis=-1), -jnp.inf)
        leaf_idx = jnp.argmax(scores)
        tree = expand(tree, leaf_idx)
        return backup(tree, leaf_idx)

    tree = jax.lax.fori_loop(0, expansions, round_fn, tree)

    def plan_body(carry, _):
        node, k, live = carry
        oh = onehot(node, N)
        ch = select_row(tree.children, oh)
        valid = ch >= 0
        ch_oh = (ch[:, None] == jnp.arange(N, dtype=jnp.int32)[None, :]) \
            & valid[:, None]
        child_vl = jnp.sum(jnp.where(ch_oh[:, :, None], tree.value_lower[None, :, :], 0.0),
                           axis=1)
        vals = jnp.where(valid, jnp.min(child_vl, axis=-1), -jnp.inf)
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


class DiscreteRobustPlannerAgent(AbstractTreeSearchAgent):
    """(reference: robust.py:53-71). The model ensemble comes either from
    ``models`` preprocessor lists applied to the true env (reference style) or
    from an explicit ``params_ensemble`` provided by the caller."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update(dict(budget=100, models=[]))
        return config

    def make_planner(self):
        pass

    def ensemble(self, env):
        """Stack env params over the model axis. The corpus spells the
        preprocessor-list-per-model key ``envs_preprocessors``
        (reference: MergeEnv/agents/DiscreteRobustMCTSAgent/agg_def.json)."""
        if getattr(self, "params_ensemble", None) is not None:
            return self.params_ensemble
        model_specs = (self.config.get("models")
                       or self.config.get("envs_preprocessors") or [])
        variants = [preprocess_env(env, preprocessors).params
                    for preprocessors in model_specs] or [env.params]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *variants)

    def planner_plan(self, env, observation):
        functional = env.functional
        num_actions = functional.action_space.n
        params_ensemble = self.ensemble(env)
        M = jax.tree.leaves(params_ensemble)[0].shape[0]
        states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (M,) + jnp.shape(x)), env.state)
        expansions = max(int(self.config["budget"]) // num_actions, 1)
        actions, length, tree = robust_opd_plan(
            functional, params_ensemble, states0, self.next_key(),
            num_actions=num_actions, num_models=M, expansions=expansions,
            gamma=float(self.config["gamma"]),
            terminal_reward=float(self.config["terminal_reward"]),
            plan_capacity=min(max(expansions, 1), 64))
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)


class IntervalRobustPlannerAgent(AbstractAgent):
    """(reference: robust.py:74-108)"""

    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        self.sub_agent = load_agent(self.config["sub_agent_path"] or
                                    self.config["sub_agent"], env)

    @classmethod
    def default_config(cls):
        return dict(sub_agent_path="",
                    sub_agent={"__class__": "DeterministicPlannerAgent"},
                    env_preprocessors=[])

    def act(self, observation):
        return self.plan(observation)[0]

    def plan(self, observation):
        self.sub_agent.env = preprocess_env(self.env, self.config["env_preprocessors"])
        return self.sub_agent.plan(observation)

    def reset(self):
        return self.sub_agent.reset()

    def seed(self, seed=None):
        return self.sub_agent.seed(seed)

    def save(self, filename):
        return self.sub_agent.save(filename)

    def load(self, filename):
        return self.sub_agent.load(filename)

    def record(self, state, action, reward, next_state, done, info):
        return self.sub_agent.record(state, action, reward, next_state, done, info)
