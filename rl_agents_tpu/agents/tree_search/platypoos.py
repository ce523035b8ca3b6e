"""PlaTyPOOS: scale-free adaptive planning for deterministic dynamics.

Rebuild of the reference planner (tree_search/platypoos.py:11-192):
layer-by-layer exploration with power-of-two evaluation schedules
(platypoos.py:30-65), a cross-validation pass over the per-scale best
candidates (platypoos.py:67-77), and plan extraction by following the best
candidate to the root (platypoos.py:79-89).

The layer bookkeeping (sorting, count thresholds, candidate tracking) is
host-side control flow over small lists; the hot path — evaluating each
selected node's actions ``count`` times — is one vmapped jitted env-step
batch per expansion. (The reference iterates ``range(1, n)`` over actions,
skipping action 0 — a slice bug; all actions are expanded here.)
"""
from __future__ import annotations

from functools import partial
from operator import attrgetter

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent


@partial(jax.jit, static_argnames=("env", "num_actions", "count"))
def _evaluate_actions(env, params, state, key, num_actions: int, count: int):
    """Step each action ``count`` times from ``state`` (vmapped)."""
    keys = jax.random.split(key, num_actions * count).reshape(num_actions, count, 2)
    actions = jnp.broadcast_to(jnp.arange(num_actions)[:, None], (num_actions, count))
    outs = jax.vmap(jax.vmap(env.step, in_axes=(None, None, 0, 0)),
                    in_axes=(None, None, 0, 0))(params, state, actions, keys)
    return outs


class _PNode:
    __slots__ = ("parent", "planner", "children", "count", "state", "depth",
                 "cumulative_reward", "done", "to_expand", "value", "action_from_parent")

    def __init__(self, parent, planner, state, depth=0, action_from_parent=None):
        self.parent = parent
        self.planner = planner
        self.children = {}
        self.count = 0
        self.state = state
        self.depth = depth
        self.cumulative_reward = 0.0
        self.done = False
        self.to_expand = False
        self.value = 0.0
        self.action_from_parent = action_from_parent

    def update(self, reward, done):
        """(reference: platypoos.py:123-133)"""
        self.cumulative_reward += reward
        self.count += 1
        parent_value = self.parent.value if self.parent else 0.0
        self.value = parent_value + self.planner.gamma ** (self.depth - 1) * (
            self.cumulative_reward / self.count)
        self.done = self.done or done

    def expand(self, next_layer, count=1):
        """Evaluate all actions ``count`` times via one device batch
        (reference: platypoos.py:135-166)."""
        if count < 1 or self.done:
            return
        planner = self.planner
        planner.openings += count
        key = planner.next_key()
        outs = _evaluate_actions(planner.env_functional, planner.env_params,
                                 self.state, key, planner.num_actions, count)
        rewards = np.asarray(outs.reward)      # [A, count]
        dones = np.asarray(outs.terminated)    # [A, count]
        for action in range(planner.num_actions):
            if action not in self.children:
                child_state = jax.tree.map(lambda x: x[action, 0], outs.state)
                self.children[action] = _PNode(self, planner, child_state,
                                               depth=self.depth + 1,
                                               action_from_parent=action)
                next_layer.append(self.children[action])
            for c in range(count):
                self.children[action].update(float(rewards[action, c]), bool(dones[action, c]))


class PlaTyPOOSAgent(AbstractTreeSearchAgent):
    """(reference: platypoos.py:189-192)"""

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update({"budget": 200, "horizon": None})
        return cfg

    def make_planner(self):
        self.num_actions = self.env.action_space.n
        self.gamma = self.config["gamma"]
        if not self.config.get("horizon"):
            expansion_budget = self.config["budget"] / self.num_actions
            self.config["horizon"] = max(int(np.floor(
                expansion_budget / (2 * (np.log2(max(expansion_budget, 2)) + 1) ** 2))), 2)
        self.candidates = {}
        self.openings = 0

    def planner_plan(self, env, observation):
        self.env_functional = env.functional
        self.env_params = env.params
        self.candidates, self.openings = {}, 0
        h_max, gamma = self.config["horizon"], self.gamma

        root = _PNode(None, self, env.state)
        current_layer = []
        root.expand(current_layer, h_max)

        # exploration (reference: platypoos.py:30-65)
        for h in range(1, h_max):
            current_layer = sorted(current_layer, key=attrgetter("value"), reverse=True)
            p_top = max(int(np.floor(np.log2(
                h_max / max(np.ceil(h ** 2 * gamma ** (2 * h)), 1e-9)))), 0)
            to_expand = []
            for p in range(p_top, -1, -1):
                nodes_count = int(np.floor(h_max / h * np.ceil(h * 2 ** p * gamma ** (2 * h))))
                evaluations = int(np.ceil(h * 2 ** p * gamma ** (2 * h)))
                min_visits = int(np.ceil((h - 1) * 2 ** p * gamma ** (2 * (h - 1))))
                for node in current_layer:
                    if node.count > min_visits and not node.to_expand:
                        node.to_expand = True
                        to_expand.append((node, evaluations, p))
                    if len(to_expand) >= nodes_count:
                        break
            next_layer = []
            for node, evaluations, p in to_expand:
                node.expand(next_layer, evaluations)
                if p not in self.candidates or node.value > self.candidates[p].value:
                    self.candidates[p] = node
            current_layer = next_layer

        # cross-validation (reference: platypoos.py:67-77)
        for node in list(self.candidates.values()):
            while node:
                evaluations = int(np.floor(
                    (node.depth + 1) * 5 * h_max * gamma ** (2 * node.depth)
                    * (1 - gamma ** 2) ** 2))
                node.expand([], evaluations)
                node = node.parent

        if not self.candidates:
            return [0]
        # plan extraction (reference: platypoos.py:79-89)
        candidate = max(self.candidates.values(), key=attrgetter("value"))
        actions = []
        while candidate.parent is not None:
            actions.insert(0, candidate.action_from_parent)
            candidate = candidate.parent
        self.last_plan_data = None
        return actions or [0]
