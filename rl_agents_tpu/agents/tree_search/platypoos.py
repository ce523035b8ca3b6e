"""PlaTyPOOS: scale-free adaptive planning for deterministic dynamics.

Rebuild of the reference planner (tree_search/platypoos.py:11-192):
layer-by-layer exploration with power-of-two evaluation schedules
(platypoos.py:30-65), a cross-validation pass over the per-scale best
candidates (platypoos.py:67-77), and plan extraction by following the best
candidate to the root (platypoos.py:79-89).

Array encoding: each depth layer is a struct-of-arrays — a stacked env-state
pytree on device plus numpy stat vectors (value/count/cum_reward/done) and
tree pointers (parent index, child base index) on host. The per-layer
schedule (sorting, count thresholds, candidate tracking) is O(layer) host
arithmetic; ALL env evaluations of a layer — the reference's per-node
``count × actions`` deepcopy-and-step loops (platypoos.py:154-166) — run as
ONE jitted vmapped batch over (selected nodes × actions × max evaluations),
with per-node evaluation counts enforced by masking. Batch shapes are padded
to power-of-two buckets so the sweep compiles O(log) programs, not one per
layer. There are no per-node Python objects anywhere.

Semantic deltas vs the reference, kept deliberate: the reference evaluates
``range(1, n)`` — skipping action 0, a slice bug — while all actions are
expanded here; and a node's terminal flag accumulates by OR over samples
rather than keeping only the last sample's ``done`` (platypoos.py:133).
Both coincide on deterministic envs, the algorithm's stated scope.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


@partial(jax.jit, static_argnames=("env", "num_actions", "max_evals"))
def _expand_batch(env, params, states, evals, key, num_actions: int, max_evals: int):
    """Evaluate every action of every selected node ``evals[i]`` times.

    states: stacked pytree [M, ...]; evals: [M] int32 (0 = padding slot).
    Returns child states [M, A] (first sample), reward sums [M, A] and
    terminal flags [M, A] masked to each node's evaluation count.
    """
    M = evals.shape[0]
    keys = jax.random.split(key, M * num_actions * max_evals).reshape(
        M, num_actions, max_evals, 2)
    actions = jnp.broadcast_to(jnp.arange(num_actions)[None, :, None],
                               (M, num_actions, max_evals))
    step = jax.vmap(jax.vmap(jax.vmap(env.step, in_axes=(None, None, 0, 0)),
                             in_axes=(None, None, 0, 0)),
                    in_axes=(None, 0, 0, 0))
    outs = step(params, states, actions, keys)
    mask = jnp.arange(max_evals)[None, None, :] < evals[:, None, None]
    cum_reward = jnp.sum(outs.reward * mask, axis=-1)       # [M, A]
    done = jnp.any(outs.terminated & mask, axis=-1)         # [M, A]
    child_states = jax.tree.map(lambda x: x[:, :, 0], outs.state)
    return child_states, cum_reward, done


class _Layer:
    """All nodes at one depth, as arrays (no per-node objects)."""

    __slots__ = ("states", "value", "count", "cum_reward", "done", "parent",
                 "action", "child_base", "size", "depth", "gamma_pow")

    def __init__(self, depth: int, size: int, states, parent, action):
        self.depth = depth
        self.size = size
        self.states = states                       # stacked pytree [size, ...]
        self.parent = parent                       # [size] index into depth-1 layer
        self.action = action                       # [size] action from parent
        self.value = np.zeros(size)
        self.count = np.zeros(size, np.int64)
        self.cum_reward = np.zeros(size)
        self.done = np.zeros(size, bool)
        self.child_base = np.full(size, -1, np.int64)  # base index into depth+1 layer


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

    # -- batched expansion ---------------------------------------------------

    def _expand(self, layer: _Layer, sel: np.ndarray, evals: np.ndarray,
                next_layer_rows: list | None):
        """Expand ``layer`` nodes ``sel`` with per-node evaluation counts.

        One device call for the whole selection (reference: platypoos.py:135-166
        runs count×A sequential deepcopy+step per node). Appends created child
        rows to ``next_layer_rows``; when a node already has children (the
        cross-validation pass), the existing child stats are updated in place.
        """
        self.openings += int(evals.sum())
        active = (~layer.done[sel]) & (evals > 0)   # done nodes don't expand
        sel, evals = sel[active], evals[active]
        if sel.size == 0:
            return
        m_pad, e_pad = _pow2(len(sel)), _pow2(int(evals.max()))
        sel_pad = np.concatenate([sel, np.zeros(m_pad - len(sel), np.int64)])
        evals_pad = np.concatenate([evals, np.zeros(m_pad - len(sel), np.int64)])
        states = jax.tree.map(lambda x: x[jnp.asarray(sel_pad)], layer.states)
        child_states, cum, done = _expand_batch(
            self.env_functional, self.env_params, states,
            jnp.asarray(evals_pad, jnp.int32), self.next_key(),
            self.num_actions, e_pad)
        cum = np.asarray(cum, np.float64)[:len(sel)]     # [M, A]
        done = np.asarray(done)[:len(sel)]

        A, g = self.num_actions, self.gamma
        for row, (i, n_evals) in enumerate(zip(sel, evals)):
            base = layer.child_base[i]
            if base < 0:
                if next_layer_rows is None:
                    continue  # cross-validation on a childless node: nothing to update
                # new children: record the expansion row, materialized per layer
                layer.child_base[i] = len(next_layer_rows) * A
                next_layer_rows.append((i, row, child_states, cum[row], done[row],
                                        n_evals, layer))
            else:
                # existing children (cross-validation): update stats in place
                # (reference: platypoos.py:124-133 update, value from live parent)
                child = self._layers[layer.depth + 1]
                idx = np.arange(base, base + A)
                child.cum_reward[idx] += cum[row]
                child.count[idx] += n_evals
                child.done[idx] |= done[row]
                child.value[idx] = layer.value[i] + g ** layer.depth * (
                    child.cum_reward[idx] / child.count[idx])

    @staticmethod
    def _materialize_layer(depth: int, rows, num_actions: int) -> _Layer:
        """Assemble the next layer's arrays from deferred expansion rows."""
        A = num_actions
        size = len(rows) * A
        parent = np.repeat([r[0] for r in rows], A)
        action = np.tile(np.arange(A), len(rows))
        # gather each row's [A, ...] child-state slice then concatenate
        slices = [jax.tree.map(lambda x, rr=r: x[rr[1]], r[2]) for r in rows]
        states = jax.tree.map(lambda *xs: jnp.concatenate([x for x in xs], axis=0), *slices) \
            if len(slices) > 1 else slices[0]
        layer = _Layer(depth, size, states, parent, action)
        for k, (i, _row, _cs, cum, done, n_evals, parent_layer) in enumerate(rows):
            idx = slice(k * A, (k + 1) * A)
            layer.cum_reward[idx] = cum
            layer.count[idx] = n_evals
            layer.done[idx] = done
            # value = parent + gamma^(child_depth-1) * mean reward
            # (reference: platypoos.py:130-132)
            layer.value[idx] = parent_layer.value[i] + \
                parent_layer.gamma_pow * (cum / n_evals)
        return layer

    # -- the planner ---------------------------------------------------------

    def planner_plan(self, env, observation):
        self.env_functional = env.functional
        self.env_params = env.params
        self.candidates, self.openings = {}, 0
        h_max, gamma, A = self.config["horizon"], self.gamma, self.num_actions

        root_states = jax.tree.map(lambda x: jnp.asarray(x)[None], env.state)
        root = _Layer(0, 1, root_states, np.array([-1]), np.array([-1]))
        self._layers = [root]

        # root expansion (reference: platypoos.py:94-97)
        rows: list = []
        root.gamma_pow = gamma ** 0  # child depth 1 → gamma^(1-1)
        self._expand(root, np.array([0]), np.array([h_max], np.int64), rows)
        if not rows:
            return [0]
        self._layers.append(self._materialize_layer(1, rows, A))

        # exploration (reference: platypoos.py:30-65)
        for h in range(1, h_max):
            layer = self._layers[h]
            order = np.argsort(-layer.value, kind="stable")
            p_top = max(int(np.floor(np.log2(
                h_max / max(np.ceil(h ** 2 * gamma ** (2 * h)), 1e-9)))), 0)
            to_expand, sel_evals, taken = [], [], np.zeros(layer.size, bool)
            for p in range(p_top, -1, -1):
                nodes_count = int(np.floor(h_max / h * np.ceil(h * 2 ** p * gamma ** (2 * h))))
                evaluations = int(np.ceil(h * 2 ** p * gamma ** (2 * h)))
                min_visits = int(np.ceil((h - 1) * 2 ** p * gamma ** (2 * (h - 1))))
                for i in order:
                    if layer.count[i] > min_visits and not taken[i]:
                        taken[i] = True
                        to_expand.append((i, p))
                        sel_evals.append(evaluations)
                    if len(to_expand) >= nodes_count:
                        break
            rows = []
            layer.gamma_pow = gamma ** h  # children at depth h+1
            if to_expand:
                sel = np.array([i for i, _ in to_expand], np.int64)
                self._expand(layer, sel, np.array(sel_evals, np.int64), rows)
            for i, p in to_expand:
                if p not in self.candidates or \
                        layer.value[i] > self._cand_value(self.candidates[p]):
                    self.candidates[p] = (h, i)
            if rows:
                self._layers.append(self._materialize_layer(h + 1, rows, A))
            else:
                break

        if not self.candidates:
            return [0]

        # cross-validation (reference: platypoos.py:67-77)
        for depth, i in list(self.candidates.values()):
            d, node = depth, i
            while d >= 0:
                layer = self._layers[d]
                evaluations = int(np.floor(
                    (d + 1) * 5 * h_max * gamma ** (2 * d) * (1 - gamma ** 2) ** 2))
                self._expand(layer, np.array([node]),
                             np.array([evaluations], np.int64), None)
                node = int(layer.parent[node]) if d > 0 else -1
                d -= 1

        # plan extraction (reference: platypoos.py:79-89)
        depth, i = max(self.candidates.values(), key=self._cand_value)
        actions = []
        while depth > 0:
            layer = self._layers[depth]
            actions.insert(0, int(layer.action[i]))
            i = int(layer.parent[i])
            depth -= 1
        self.last_plan_data = None
        return actions or [0]

    def _cand_value(self, cand):
        depth, i = cand
        return self._layers[depth].value[i]
