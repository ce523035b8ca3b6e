"""Sparse Sampling (Kearns et al.), level-synchronous.

Rebuild of the reference planner (tree_search/sparse_sampling.py:11-103): the
recursive estimateV/estimateQ mutual recursion to a fixed horizon with C
samples per (s, a) (sparse_sampling.py:71-88, one env deepcopy per sample)
becomes a breadth-first sweep: level d holds all (A*C)^d sampled states as a
stacked pytree, one vmapped env step expands a whole level, and a backward
pass computes V_d = max_a [ mean_c r + gamma * mean_c V_{d+1} ].

(The reference's estimateQ adds the *last* sampled reward rather than the
sample mean — a loop-variable leak, sparse_sampling.py:87; the mean is used
here, which is the Kearns estimator.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent
from rl_agents_tpu.envs.base import FunctionalEnv


@partial(jax.jit, static_argnames=("env", "num_actions", "horizon", "samples"))
def sparse_sampling_plan(env: FunctionalEnv, params, state0, key, num_actions: int,
                         horizon: int, samples: int, gamma: float):
    A, C, H = num_actions, samples, horizon
    gamma = jnp.float32(gamma)

    # forward: expand levels 0..H-1
    states = jax.tree.map(lambda x: jnp.asarray(x)[None], state0)  # [1, ...]
    level_rewards = []
    level_dones = []
    dones = jnp.zeros((1,), bool)
    for d in range(H):
        n = A ** d * C ** d

        def step_one(state, action, k):
            return env.transition(params, state, action, k)

        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, n * A * C).reshape(n, A, C, 2)
        actions = jnp.broadcast_to(jnp.arange(A)[None, :, None], (n, A, C))
        outs = jax.vmap(jax.vmap(jax.vmap(step_one, in_axes=(None, 0, 0)),
                                 in_axes=(None, 0, 0)),
                        in_axes=(0, 0, 0))(states, actions, keys)
        reward = jnp.where(dones[:, None, None], 0.0, outs.reward)   # [n, A, C]
        done = outs.terminated | dones[:, None, None]
        level_rewards.append(reward)
        level_dones.append(done)
        states = jax.tree.map(lambda x: x.reshape((n * A * C,) + x.shape[3:]), outs.state)
        dones = done.reshape(n * A * C)

    # backward: V_H = 0; Q_d = mean_c r + gamma * mean_c V_{d+1}(child)
    v = jnp.zeros((A ** H * C ** H,))
    q_root = None
    for d in reversed(range(H)):
        n = A ** d * C ** d
        v_next = v.reshape(n, A, C)
        v_next = jnp.where(level_dones[d], 0.0, v_next)
        q = level_rewards[d].mean(axis=2) + gamma * v_next.mean(axis=2)  # [n, A]
        if d == 0:
            q_root = q[0]
        v = q.max(axis=1)

    return jnp.argmax(q_root), q_root


class SparseSamplingAgent(AbstractTreeSearchAgent):
    """(reference: sparse_sampling.py:99-103)"""

    @classmethod
    def default_config(cls):
        config = super().default_config()
        config.update({"budget": 100, "horizon": None, "C": 2})
        return config

    def make_planner(self):
        A = self.env.action_space.n
        C = self.config["C"]
        if not self.config.get("horizon"):
            # deepest horizon whose product tree fits in the step budget
            budget = max(self.config["budget"], A * C)
            self.config["horizon"] = max(int(np.log(budget) / np.log(A * C)), 1)

    def planner_plan(self, env, observation):
        functional = env.functional
        action, q_root = sparse_sampling_plan(
            functional, env.params, env.state, self.next_key(),
            num_actions=functional.action_space.n, horizon=int(self.config["horizon"]),
            samples=int(self.config["C"]), gamma=float(self.config["gamma"]))
        self.last_plan_data = q_root
        return [int(action)]
