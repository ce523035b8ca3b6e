"""TrailBlazer: sample-efficient Monte-Carlo planning (MaxNode/AvgNode recursion).

Rebuild of the reference (tree_search/trailblazer.py:6-142), which is
self-contained and not wired to the tree-search agent shell. The adaptive
MaxNode/AvgNode recursion — data-dependent candidate elimination with
per-node sample counts — stays on the host (as in the reference), but the
oracle is batched: an AvgNode that needs ``k`` more transition samples draws
them in ONE jitted vmapped env-step call (padded to power-of-two bucket
sizes so the run compiles O(log max-batch) programs), and the children's
observation keys used for next-state aggregation (the reference compares
``state.mdp.state``, trailblazer.py:42-44) are computed in the same batch.
The reference pays one deepcopy + one env step + one observation per sample
(trailblazer.py:70-78); here a sample costs 1/k-th of a device dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 0).bit_length()


@partial(jax.jit, static_argnames=("env", "n"))
def _oracle_batch(env, params, state, action, key, n: int):
    """n independent transition samples from (state, action), plus the
    sampled next observations for aggregation keys."""
    keys = jax.random.split(key, n)
    outs = jax.vmap(env.step, in_axes=(None, None, None, 0))(
        params, state, action, keys)
    obs = jax.vmap(env.observe, in_axes=(None, 0))(params, outs.state)
    return outs.state, outs.reward, obs


class MaxNode:
    def __init__(self, planner, state, depth=0, obs_key=None):
        self.planner = planner
        self.state = state
        self.depth = depth
        self.obs_key = obs_key
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
        need = min(m - len(self.sampled_nodes),
                   p.max_oracle_calls - p.oracle_calls)
        if need > 0:
            states, rewards, keys = p.oracle_sample(self.state, self.action, need)
            for i in range(need):
                child_state = jax.tree.map(lambda x, ii=i: x[ii], states)
                self.sampled_nodes.append(
                    MaxNode(p, child_state, self.depth + 1, obs_key=keys[i]))
            self.r += float(rewards)
        if not self.sampled_nodes:
            return self.r
        active_nodes = self.sampled_nodes[:m]
        # aggregate duplicates by observation (reference: trailblazer.py:42-44)
        uniques, counts = [], []
        index = {}
        for s in active_nodes:
            i = index.get(s.obs_key)
            if i is None:
                index[s.obs_key] = len(uniques)
                uniques.append(s)
                counts.append(1)
            else:
                counts[i] += 1
        mu = 0.0
        for node, count in zip(uniques, counts):
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
        self.oracle_calls = 0
        self.root = MaxNode(self, env_handle.state)

    def oracle_sample(self, state, action, n: int):
        """n transition samples in one padded batched dispatch.

        Returns (stacked child states [n,...], summed reward over the n
        samples, list of n hashable observation keys)."""
        self.key, sub = jax.random.split(self.key)
        self.oracle_calls += n
        n_pad = _pow2(n)
        states, rewards, obs = _oracle_batch(
            self.functional, self.params, state, jnp.asarray(action), sub, n_pad)
        obs_np = np.asarray(jax.tree.leaves(obs)[0])[:n]
        keys = [obs_np[i].tobytes() for i in range(n)]
        reward_sum = float(np.asarray(rewards)[:n].sum())
        return states, reward_sum, keys

    def run(self):
        return self.root.run(self.m, self.epsilon / 2)
