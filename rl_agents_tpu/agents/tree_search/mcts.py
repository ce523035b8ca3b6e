"""Monte-Carlo Tree Search with UCT-style exploration, array-encoded.

Rebuild of the reference planner (tree_search/mcts.py:100-305). Episodes run
inside one jitted ``fori_loop``: descend by the selection score
``value + temperature * |children| * prior / (count + 1)`` (mcts.py:275-286),
expand the reached leaf with prior probabilities, roll out the rollout policy
to the horizon (mcts.py:160-177), and back the discounted return up the branch
(mcts.py:248-265). The tree lives in fixed device arrays; the env state is a
functional pytree stepped in-place along the descent — no deep copies
(the reference deep-copies the whole env once per episode, mcts.py:183).

Budget allocation into (episodes, horizon) follows OLOP (mcts.py:116-118).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.common import (
    AbstractTreeSearchAgent,
    allocation,
    arena_subtree_gather,
)
from rl_agents_tpu.envs.base import FunctionalEnv


class MCTSTree(NamedTuple):
    parent: Any     # [N] i32
    children: Any   # [N, A] i32, -1 when absent
    count: Any      # [N] i32
    value: Any      # [N] f32
    prior: Any      # [N] f32
    used: Any       # [] i32


def make_prior_fn(policy_config: dict, num_actions: int):
    """Prior/rollout policy probability vectors (reference: mcts.py:33-97)."""
    ptype = policy_config.get("type", "random_available")
    if ptype in ("random", "random_available"):
        probs = np.ones(num_actions) / num_actions
    elif ptype == "preference":
        action = policy_config["action"]
        ratio = policy_config.get("ratio", 2)
        probs = np.ones(num_actions) / (num_actions - 1 + ratio)
        probs[action] *= ratio
    else:
        raise ValueError(f"Unknown policy type {ptype}")
    return jnp.asarray(probs, jnp.float32)


def _masked_random_argmax(key, scores, mask):
    """Random tie-breaking argmax over masked entries (reference: Node.random_argmax,
    abstract.py:295-311; ties by exact equality with the max)."""
    vals = jnp.where(mask, scores, -jnp.inf)
    m = jnp.max(vals)
    ties = mask & (vals == m)
    return jax.random.categorical(key, jnp.where(ties, 0.0, -jnp.inf))


def _init_mcts_tree(capacity: int, num_actions: int) -> MCTSTree:
    N, A = capacity, num_actions
    return MCTSTree(
        parent=jnp.full((N,), -1, jnp.int32),
        children=jnp.full((N, A), -1, jnp.int32),
        count=jnp.zeros((N,), jnp.int32),
        value=jnp.zeros((N,), jnp.float32),
        prior=jnp.ones((N,), jnp.float32),
        used=jnp.ones((), jnp.int32),
    )


def _mcts_episodes(env, params, tree, state0, key, prior_probs, rollout_probs,
                   num_actions, episodes, horizon, gamma, temperature):
    """The MCTS episode loop (descend/expand/rollout/backup) on a given arena."""
    A = num_actions
    gamma = jnp.float32(gamma)

    def episode_fn(_, carry):
        tree, key = carry
        key, kdesc, kroll, kexp = jax.random.split(key, 4)

        # ---- descend ----------------------------------------------------
        def cond(c):
            node, state, depth, total, terminal, k = c
            return (tree.children[node, 0] >= 0) & (depth < horizon) & ~terminal

        def body(c):
            node, state, depth, total, terminal, k = c
            ch = tree.children[node]
            valid = ch >= 0
            chs = jnp.maximum(ch, 0)
            n_children = jnp.sum(valid).astype(jnp.float32)
            scores = tree.value[chs] + temperature * n_children * tree.prior[chs] / (
                tree.count[chs].astype(jnp.float32) + 1.0)
            k, ka, ks = jax.random.split(k, 3)
            action = _masked_random_argmax(ka, scores, valid)
            out = env.transition(params, state, action, ks)
            total = total + gamma ** depth.astype(jnp.float32) * out.reward
            return (ch[action], out.state, depth + 1, total,
                    terminal | out.terminated, k)

        node, state, depth, total, terminal, _ = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), state0, jnp.zeros((), jnp.int32),
             jnp.zeros(()), jnp.zeros((), bool), kdesc))

        # ---- expand (reference: mcts.py:151-154) ------------------------
        is_leaf = tree.children[node, 0] < 0
        do_expand = is_leaf & (depth < horizon) & (~terminal | (node == 0))
        base = tree.used
        child_ids = base + jnp.arange(A, dtype=jnp.int32)
        new_children = jnp.where(do_expand, child_ids, tree.children[node])
        tree = tree._replace(
            children=tree.children.at[node].set(new_children),
            parent=jnp.where(do_expand,
                             tree.parent.at[child_ids].set(node), tree.parent),
            prior=jnp.where(do_expand,
                            tree.prior.at[child_ids].set(prior_probs), tree.prior),
            used=tree.used + jnp.where(do_expand, A, 0),
        )

        # ---- rollout (reference: mcts.py:160-177) -----------------------
        def rollout_body(c, _):
            state, h, total, terminal, k = c
            k, ka, ks = jax.random.split(k, 3)
            action = jax.random.categorical(ka, jnp.log(rollout_probs))
            out = env.transition(params, state, action, ks)
            live = (h < horizon) & ~terminal
            total = total + jnp.where(live, gamma ** h.astype(jnp.float32) * out.reward, 0.0)
            state = jax.tree.map(lambda old, new: jnp.where(live, new, old), state, out.state)
            return (state, h + 1, total, terminal | (live & out.terminated), k), None

        (_, _, rolled_total, _, _), _ = jax.lax.scan(
            rollout_body, (state, depth, total, terminal, kroll), None, length=horizon)
        total = jnp.where(terminal, total, rolled_total)

        # ---- backup (reference: mcts.py:248-265) ------------------------
        def up_cond(c):
            n, _, _ = c
            return n >= 0

        def up_body(c):
            n, count, value = c
            count = count.at[n].add(1)
            value = value.at[n].add((total - value[n]) / count[n].astype(jnp.float32))
            return tree.parent[n], count, value

        _, count, value = jax.lax.while_loop(up_cond, up_body, (node, tree.count, tree.value))
        return tree._replace(count=count, value=value), key

    tree, key = jax.lax.fori_loop(0, episodes, episode_fn, (tree, key))
    return tree


def _extract_plan(tree: MCTSTree, horizon: int):
    # ---- plan extraction (reference: mcts.py:212-218 selection_rule) ----
    # best visit count, ties broken by value
    def plan_body(carry, _):
        node, live = carry
        ch = tree.children[node]
        valid = ch >= 0
        chs = jnp.maximum(ch, 0)
        counts = jnp.where(valid, tree.count[chs], -1)
        max_count = jnp.max(counts)
        tie = valid & (counts == max_count)
        vals = jnp.where(tie, tree.value[chs], -jnp.inf)
        action = jnp.argmax(vals)  # max() over ties keeps the highest value
        emit = live & jnp.any(valid)
        return (jnp.where(emit, ch[action], node), emit), jnp.where(emit, action, -1)

    (_, _), actions = jax.lax.scan(
        plan_body, (jnp.zeros((), jnp.int32), jnp.asarray(True)), None, length=horizon)
    length = jnp.sum(actions >= 0)
    return actions, length


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon"))
def mcts_plan(env: FunctionalEnv, params, state0, key, prior_probs, rollout_probs,
              num_actions: int, episodes: int, horizon: int, gamma: float,
              temperature: float):
    """Full MCTS plan as one device program."""
    tree = _init_mcts_tree(1 + episodes * num_actions, num_actions)
    tree = _mcts_episodes(env, params, tree, state0, key, prior_probs, rollout_probs,
                          num_actions, episodes, horizon, gamma, temperature)
    actions, length = _extract_plan(tree, horizon)
    return actions, length, tree


@partial(jax.jit, static_argnames=("env", "num_actions", "episodes", "horizon"))
def mcts_plan_continue(env: FunctionalEnv, params, tree: MCTSTree, state0, key,
                       prior_probs, rollout_probs, num_actions: int, episodes: int,
                       horizon: int, gamma: float, temperature: float):
    """Continue MCTS in a carried (re-rooted) arena — the reference's plan()
    after step_by_prior (mcts.py:179-200): episodes descend from the *current*
    env state through the carried statistics. The arena must have spare
    capacity >= episodes * num_actions."""
    tree = _mcts_episodes(env, params, tree, state0, key, prior_probs, rollout_probs,
                          num_actions, episodes, horizon, gamma, temperature)
    actions, length = _extract_plan(tree, horizon)
    return actions, length, tree


@partial(jax.jit, static_argnames=("num_actions", "out_capacity"))
def mcts_step_by_prior(tree: MCTSTree, action, num_actions: int, out_capacity: int,
                       regularization: float = 0.5):
    """Re-root the arena at the chosen child and convert visit counts to
    priors (reference: mcts.py:192-200 step_by_prior +
    convert_visits_to_prior_in_branch, mcts.py:288-301): for every node in the
    carried subtree, ``prior = (1-reg)*(count+1)/sum(count+1) + reg/|children|``
    over its sibling block, then all counts reset to zero; values are kept.

    Returns ``(new_tree, valid)``; ``valid=False`` when the action was never
    explored from the root.
    """
    old_of_new, new_id, used, slot, valid = arena_subtree_gather(
        tree.parent, tree.children, tree.used, action, out_capacity)

    def take(x, fill):
        return jnp.where(slot if x.ndim == 1 else slot[:, None], x[old_of_new], fill)

    parent = take(new_id[jnp.maximum(tree.parent, 0)], -1).at[0].set(-1)
    children = take(jnp.where(tree.children >= 0,
                              new_id[jnp.maximum(tree.children, 0)], -1), -1)
    count = take(tree.count, 0)
    value = take(tree.value, 0.0)
    prior = take(tree.prior, 1.0)

    # Visit counts -> priors, computed from each node's sibling block.
    sib = children[jnp.maximum(parent, 0)]
    sib_valid = sib >= 0
    sib_counts = jnp.where(sib_valid, count[jnp.maximum(sib, 0)], 0)
    total = jnp.sum(sib_counts + sib_valid.astype(jnp.int32), axis=1).astype(jnp.float32)
    n_sib = jnp.sum(sib_valid, axis=1).astype(jnp.float32)
    converted = ((1 - regularization) * (count + 1).astype(jnp.float32)
                 / jnp.maximum(total, 1.0) + regularization / jnp.maximum(n_sib, 1.0))
    prior = jnp.where((parent >= 0) & slot, converted, prior)
    count = jnp.zeros_like(count)

    return MCTSTree(parent=parent, children=children, count=count,
                    value=value, prior=prior, used=used), valid


def mcts_grow_arena(tree: MCTSTree, extra: int) -> MCTSTree:
    """Pad the arena with ``extra`` unallocated slots for continued planning."""
    def pad(x, fill):
        return jnp.concatenate(
            [x, jnp.full((extra,) + x.shape[1:], fill, x.dtype)], axis=0)

    return MCTSTree(parent=pad(tree.parent, -1), children=pad(tree.children, -1),
                    count=pad(tree.count, 0), value=pad(tree.value, 0),
                    prior=pad(tree.prior, 1), used=tree.used)


def mcts_plan_batch(env, params, states0, keys, prior_probs, rollout_probs,
                    num_actions, episodes, horizon, gamma, temperature):
    """Batched MCTS over a leading tree-batch axis (fused implementation —
    see mcts_fused.py for the TPU-oriented loop restructuring)."""
    from rl_agents_tpu.agents.tree_search.mcts_fused import mcts_plan_batch_fused

    return mcts_plan_batch_fused(env, params, states0, keys, prior_probs,
                                 rollout_probs, num_actions=num_actions,
                                 episodes=episodes, horizon=horizon,
                                 gamma=gamma, temperature=temperature)


def mcts_plan_batch_vmap(env, params, states0, keys, prior_probs, rollout_probs,
                         num_actions, episodes, horizon, gamma, temperature):
    """vmap of the single-tree mcts_plan (reference loop structure; kept for
    cross-validation against the fused planner)."""
    fn = partial(mcts_plan, env, num_actions=num_actions, episodes=episodes,
                 horizon=horizon, gamma=gamma, temperature=temperature)
    return jax.vmap(lambda s, k: fn(params, s, k, prior_probs, rollout_probs))(states0, keys)


class MCTSAgent(AbstractTreeSearchAgent):
    """MCTS/UCT agent (reference: mcts.py:12-31). Supports
    ``step_strategy: "prior"``: the arena is re-rooted between env steps with
    visit counts converted to priors, and the next plan continues in the
    carried tree (reference: mcts.py:186-200)."""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({
            "budget": 100,
            "horizon": None,
            "episodes": None,
            "prior_policy": {"type": "random_available"},
            "rollout_policy": {"type": "random_available"},
            "temperature": None,
            "closed_loop": False,
            "subtree_carry": None,
        })
        return config

    def make_planner(self):
        self.carried_tree = None  # arena carried across steps ("prior" strategy)
        if not self.config.get("horizon"):
            self.config["episodes"], self.config["horizon"] = allocation(
                self.config["budget"], self.config["gamma"])
        elif not self.config.get("episodes"):
            self.config["episodes"] = max(self.config["budget"] // self.config["horizon"], 1)
        if self.config.get("temperature") is None:
            self.config["temperature"] = 2 / (1 - self.config["gamma"])
        num_actions = self.env.action_space.n
        self.prior_probs = make_prior_fn(self.config["prior_policy"], num_actions)
        self.rollout_probs = make_prior_fn(self.config["rollout_policy"], num_actions)

    def planner_plan(self, env, observation):
        functional = env.functional
        if self.config.get("closed_loop"):
            from rl_agents_tpu.agents.tree_search.mcts_closed_loop import (
                mcts_closed_loop_plan,
            )

            action, tree = mcts_closed_loop_plan(
                functional, env.params, env.state, self.next_key(),
                self.prior_probs, self.rollout_probs,
                num_actions=functional.action_space.n,
                episodes=int(self.config["episodes"]),
                horizon=int(self.config["horizon"]),
                gamma=float(self.config["gamma"]),
                temperature=float(self.config["temperature"]),
                width=int(self.config.get("max_next_states_count", 8)))
            self.last_plan_data = tree
            return [int(action)]
        kwargs = dict(num_actions=functional.action_space.n,
                      episodes=int(self.config["episodes"]),
                      horizon=int(self.config["horizon"]),
                      gamma=float(self.config["gamma"]),
                      temperature=float(self.config["temperature"]))
        if self.carried_tree is not None:
            actions, length, tree = mcts_plan_continue(
                functional, env.params, self.carried_tree, env.state,
                self.next_key(), self.prior_probs, self.rollout_probs, **kwargs)
        else:
            actions, length, tree = mcts_plan(
                functional, env.params, env.state, self.next_key(),
                self.prior_probs, self.rollout_probs, **kwargs)
        self.last_plan_data = tree
        return self.get_plan_list(actions, length)

    def planner_step_tree(self, actions):
        if self.config["step_strategy"] != "prior" or self.config.get("closed_loop"):
            return
        tree = self.last_plan_data
        if tree is None or not actions:
            self.carried_tree = None
            return
        num_actions = tree.children.shape[1]
        episodes = int(self.config["episodes"])
        carry = int(self.config.get("subtree_carry") or episodes * num_actions)
        new_tree, valid = mcts_step_by_prior(
            tree, int(actions[0]), num_actions=num_actions, out_capacity=carry)
        if bool(valid):
            self.carried_tree = mcts_grow_arena(new_tree, episodes * num_actions)
        else:  # never-explored action: plan from scratch (abstract.py:203-206)
            self.carried_tree = None

    def reset(self):
        super().reset()
        self.carried_tree = None
