"""TrailBlazer: sample-efficient Monte-Carlo planning (MaxNode/AvgNode recursion).

Rebuild of the reference (tree_search/trailblazer.py:6-142), which is
self-contained and not wired to the tree-search agent shell. The recursion
structure is preserved on the host; the oracle calls are jitted functional
env steps, and sampled next-states are aggregated by observation value
(the reference compares ``state.mdp.state``, trailblazer.py:42-44).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class MaxNode:
    def __init__(self, planner, state, depth=0):
        self.planner = planner
        self.state = state
        self.depth = depth
        self.children = [AvgNode(planner, state, action, depth + 1)
                         for action in range(planner.K)]

    def run(self, m, epsilon):
        """(reference: trailblazer.py:20-39)"""
        p = self.planner
        candidates = list(self.children)
        L = 1
        U = 1 / (1 - p.gamma)
        mu = []
        while len(candidates) > 1 and U >= (1 - p.eta) * epsilon:
            sqr = (np.log(p.K * L / (p.delta * epsilon))
                   + p.gamma / (p.eta - p.gamma) + p.alpha + 1) / L
            U = 2 / (1 - p.gamma) * np.sqrt(max(sqr, 0.0))
            mu = [(b, b.run(L, U * p.eta / (1 - p.eta))) for b in candidates]
            mu_sup = max(mu, key=lambda c: c[1])[1]
            candidates = [c[0] for c in mu
                          if c[1] + 2 * U / (1 - p.eta) >= mu_sup - 2 * U / (1 - p.eta)]
            L += 1
        if len(candidates) > 1:
            return max(mu, key=lambda c: c[1])[1]
        return candidates[0].run(m, p.eta * epsilon)

    def obs_value(self):
        return self.planner.observe_bytes(self.state)


class AvgNode:
    def __init__(self, planner, state, action, depth):
        self.planner = planner
        self.state = state
        self.action = action
        self.depth = depth
        self.sampled_nodes = []
        self.r = 0.0

    def run(self, m, epsilon):
        """(reference: trailblazer.py:62-92)"""
        p = self.planner
        m = int(np.ceil(m))
        if epsilon >= 1 / (1 - p.gamma):
            return 0.0
        if p.oracle_calls >= p.max_oracle_calls:
            # budget cap (absent in the reference, whose sample complexity is
            # unbounded in practice): return the current empirical estimate
            return self.r / max(len(self.sampled_nodes), 1)
        if len(self.sampled_nodes) >= m:
            active_nodes = self.sampled_nodes[:m]
        else:
            while len(self.sampled_nodes) < m:
                out = p.oracle_step(self.state, self.action)
                self.sampled_nodes.append(MaxNode(p, out.state, self.depth + 1))
                self.r += float(out.reward)
            active_nodes = self.sampled_nodes
        # aggregate duplicates by observation
        uniques, counts = [], []
        keys = [s.obs_value() for s in active_nodes]
        for s, k in zip(active_nodes, keys):
            try:
                i = [u[1] for u in uniques].index(k)
                counts[i] += 1
            except ValueError:
                uniques.append((s, k))
                counts.append(1)
        mu = 0.0
        for (node, _), count in zip(uniques, counts):
            nu = node.run(count, epsilon / p.gamma)
            mu += count / m * nu
        return self.r / max(len(self.sampled_nodes), 1) + p.gamma * mu


class TrailBlazer:
    """(reference: trailblazer.py:95-117)"""

    def __init__(self, env_handle, gamma=0.9, delta=0.1, epsilon=1.0,
                 max_oracle_calls: int = 10000):
        self.max_oracle_calls = max_oracle_calls
        self.functional = env_handle.functional
        self.params = env_handle.params
        self.gamma = gamma
        self.delta = delta
        self.epsilon = epsilon
        self.eta = np.power(gamma, 1 / max(2, np.log(1 / epsilon)))
        self.K = self.functional.action_space.n
        self.alpha = 0.0
        self.m = (np.log(1 / delta) + self.alpha) / ((1 - gamma) ** 2 * epsilon ** 2)
        self.key = jax.random.PRNGKey(0)
        self._step = jax.jit(self.functional.step)
        self.oracle_calls = 0
        self.root = MaxNode(self, env_handle.state)

    def oracle_step(self, state, action):
        self.key, sub = jax.random.split(self.key)
        self.oracle_calls += 1
        return self._step(self.params, state, jnp.asarray(action), sub)

    def observe_bytes(self, state):
        obs = self.functional.observe(self.params, state)
        return np.asarray(jax.tree.leaves(obs)[0]).tobytes()

    def run(self):
        return self.root.run(self.m, self.epsilon / 2)
