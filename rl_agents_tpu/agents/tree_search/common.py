"""Tree-search shell: receding-horizon driver + budget allocation.

Rebuild of the reference's tree-search agent machinery
(tree_search/abstract.py:15-106): ``plan()`` handles the receding-horizon
counter and tree-reuse strategy and delegates the search itself to a planner.

The TPU-native difference is *where the planner lives*: the reference mutates
a Python object tree with per-node env deep-copies; here each planner is a
single jitted program over fixed-capacity node arenas (see deterministic.py,
mcts.py, olop.py) operating on functional env states, vmappable over batches
of thousands of trees.
"""
from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.factory import preprocess_env

logger = logging.getLogger(__name__)


def olop_horizon(episodes: int, gamma: float) -> int:
    """L(M, gamma) (reference: olop.py:42-44)."""
    return max(int(np.ceil(np.log(episodes) / (2 * np.log(1 / gamma)))), 1)


def allocation(budget: int, gamma: float):
    """Split a budget into M episodes x horizon L (reference: olop.py:50-62)."""
    for episodes in range(1, int(budget)):
        if episodes * olop_horizon(episodes, gamma) > budget:
            episodes = max(episodes - 1, 1)
            return episodes, olop_horizon(episodes, gamma)
    raise ValueError(f"Could not split budget {budget} with gamma {gamma}")


def arena_subtree_gather(parent, children, used, action, out_capacity: int):
    """Compute the stable-gather compaction of the subtree rooted at the
    root's child for ``action`` in a node arena (the array analog of the
    reference's step_by_subtree root-pointer move, abstract.py:194-206).

    Subtree membership is found by pointer doubling over parent links. Because
    parents always precede children in creation order, sibling blocks (the A
    children written by one expansion) are contiguous and uniform under the
    mask, so truncating at a block boundary when the subtree exceeds
    ``out_capacity`` keeps the tree well-formed.

    Returns ``(old_of_new, new_id, new_used, slot, valid)``:
    ``old_of_new [M]`` gathers old arena rows into the new arena,
    ``new_id [N]`` maps old ids to new ids (-1 if dropped),
    ``slot [M]`` marks allocated rows, ``valid`` is False when the action was
    never explored from the root.
    """
    N, A = children.shape
    idx = jnp.arange(N, dtype=jnp.int32)
    # structural aliveness: arenas with round-/episode-indexed slot bases are
    # allowed holes (slots never written), so `idx < used` is not a valid
    # membership test — allocated non-root nodes always have a parent
    alive = (idx == 0) | (parent >= 0)
    del used
    new_root = children[0, action]
    valid = new_root >= 0

    mask = (idx == new_root) & alive
    jump = jnp.where(parent >= 0, parent, idx)
    rounds = max(int(N).bit_length(), 1)

    def double(_, carry):
        mask, jump = carry
        return mask | mask[jump], jump[jump]

    mask, _ = jax.lax.fori_loop(0, rounds, double, (mask, jump))
    mask = mask & alive

    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    size = jnp.sum(mask.astype(jnp.int32))
    cutoff = 1 + (jnp.minimum(size, out_capacity) - 1) // A * A
    kept = mask & (rank < cutoff)
    new_id = jnp.where(kept, rank, -1)
    old_of_new = jnp.nonzero(kept, size=out_capacity, fill_value=0)[0]
    new_used = jnp.sum(kept.astype(jnp.int32))
    slot = jnp.arange(out_capacity, dtype=jnp.int32) < new_used
    return old_of_new, new_id, new_used, slot, valid


class AbstractTreeSearchAgent(AbstractAgent):
    """Receding-horizon driver (reference: tree_search/abstract.py:15-106)."""

    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        self.previous_actions: List[int] = []
        self.remaining_horizon = 0
        self.steps = 0
        self.key = jax.random.PRNGKey(0)
        self.last_plan_data = None  # planner outputs for introspection/graphics
        self.make_planner()

    @classmethod
    def default_config(cls):
        return {
            "budget": 500,
            "gamma": 0.8,
            "step_strategy": "reset",
            "env_preprocessors": [],
            "display_tree": False,
            "receding_horizon": 1,
            "terminal_reward": 0,
        }

    def make_planner(self):
        """Build the jitted planner program for this env/config."""
        raise NotImplementedError

    def planner_plan(self, env, observation) -> List[int]:
        """Run the planner on the (preprocessed) environment state."""
        raise NotImplementedError

    def plan(self, observation):
        self.steps += 1
        replanning_required = self.step(self.previous_actions)
        if replanning_required:
            # also honor the corpus's singular "env_preprocessor" spelling
            # (MergeEnv/agents/MCTSAgent/assume_aggressive.json) — the
            # reference reads only the plural and silently planned on the
            # unmodified env there
            preprocessors = self.config["env_preprocessors"] \
                or self.config.get("env_preprocessor") or []
            env = preprocess_env(self.env, preprocessors)
            actions = self.planner_plan(env, observation)
        else:
            actions = self.previous_actions[1:]
        self.write_tree()
        self.previous_actions = actions
        return actions

    def step(self, actions):
        """Receding-horizon counter (reference: abstract.py:70-82)."""
        replanning_required = self.remaining_horizon == 0 or len(actions) <= 1
        if replanning_required:
            self.remaining_horizon = self.config["receding_horizon"] - 1
        else:
            self.remaining_horizon -= 1
        self.planner_step_tree(actions)
        return replanning_required

    def planner_step_tree(self, actions):
        """Tree-reuse hook (reference: abstract.py:172-206 step_tree).
        Default: no carried state, i.e. 'reset'. Planners with arena re-rooting
        (OPD) override for step_strategy == 'subtree'; others degrade to
        replanning (the entire plan costs one device program here)."""

    def act(self, state):
        actions = self.plan(state)
        return actions[0]

    def reset(self):
        self.previous_actions = []
        self.remaining_horizon = 0
        self.steps = 0
        self.last_plan_data = None

    def seed(self, seed=None):
        if seed is not None:
            self.key = jax.random.PRNGKey(seed)
        return [seed]

    def record(self, state, action, reward, next_state, done, info):
        pass

    def next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def write_tree(self):
        if self.config.get("display_tree") and self.writer and self.last_plan_data is not None:
            from rl_agents_tpu.graphics.tree_plot import TreePlot

            TreePlot(self.last_plan_data, max_depth=6).plot_to_writer(
                self.writer, epoch=self.steps)

    def get_plan_list(self, actions, length) -> List[int]:
        actions = np.asarray(actions)
        length = int(length)
        return [int(a) for a in actions[:max(length, 1)]]
