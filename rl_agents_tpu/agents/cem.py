"""Cross-Entropy Method planning, fully vectorised.

Rebuild of the reference CEM planners (cross_entropy_method/cem.py:8-66 and
pytorch.py:20-44): a Gaussian belief over action sequences is refit to the
top-k candidates each iteration. The reference deep-copies the env once per
candidate and steps them in a double Python loop (cem.py:30-39); here all
candidates roll out under one ``vmap`` x ``scan`` jit program — the candidate
axis is free parallelism — and the learned-model variant (LatentCEMAgent,
PlaNet-style) batches candidates through the transition/reward models the
same way.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.envs.base import Box, FunctionalEnv


@partial(jax.jit, static_argnames=("env", "horizon", "iterations", "candidates",
                                   "top_candidates", "action_size", "discrete"))
def cem_plan(env: FunctionalEnv, params, state0, key, horizon: int, iterations: int,
             candidates: int, top_candidates: int, gamma: float, action_size: int,
             discrete: bool = False):
    """One full CEM plan: iterations x [sample -> rollout (vmapped) -> refit]."""
    gamma = jnp.float32(gamma)
    discounts = gamma ** jnp.arange(horizon, dtype=jnp.float32)

    def rollout(actions, key):
        """Return of one candidate action sequence [horizon, action_size]."""

        def body(carry, inp):
            state, live = carry
            action, k = inp
            if discrete:
                action = action[0].astype(jnp.int32)
            out = env.transition(params, state, action, k)
            reward = jnp.where(live, out.reward, 0.0)
            return (out.state, live & ~out.done), reward

        keys = jax.random.split(key, horizon)
        (_, _), rewards = jax.lax.scan(body, (state0, jnp.asarray(True)), (actions, keys))
        return jnp.sum(rewards * discounts)

    def iteration(carry, _):
        mean, std, key = carry
        key, ks, kr = jax.random.split(key, 3)
        actions = mean[None] + std[None] * jax.random.normal(
            ks, (candidates, horizon, action_size))
        returns = jax.vmap(rollout)(actions, jax.random.split(kr, candidates))
        _, topk = jax.lax.top_k(returns, top_candidates)
        best = actions[topk]
        mean = best.mean(axis=0)
        std = best.std(axis=0)  # biased, like the reference (unbiased=False)
        return (mean, std, key), returns.max()

    init = (jnp.zeros((horizon, action_size)), jnp.ones((horizon, action_size)), key)
    (mean, std, _), best_returns = jax.lax.scan(iteration, init, None, length=iterations)
    return mean, best_returns


class CEMAgent(AbstractAgent):
    """CEM planner on the env-as-oracle (reference: cem.py:8-66)."""

    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        space = env.action_space
        if isinstance(space, Box):
            self.action_size = int(np.prod(space.shape)) or 1
            self.discrete = False
        else:
            self.action_size = 1
            self.discrete = True
        self.key = jax.random.PRNGKey(0)

    @classmethod
    def default_config(cls):
        return dict(gamma=1.0, horizon=10, iterations=10, candidates=100,
                    top_candidates=10)

    def plan(self, observation):
        self.key, sub = jax.random.split(self.key)
        mean, _ = cem_plan(
            self.env.functional, self.env.params, self.env.state, sub,
            horizon=self.config["horizon"], iterations=self.config["iterations"],
            candidates=self.config["candidates"],
            top_candidates=self.config["top_candidates"],
            gamma=self.config["gamma"], action_size=self.action_size,
            discrete=self.discrete)
        if self.discrete:
            return [int(a) for a in np.asarray(mean[:, 0] > 0.5, np.int32)]
        return np.asarray(mean).tolist()

    def act(self, state):
        return self.plan(state)[0]

    def record(self, state, action, reward, next_state, done, info):
        pass

    def reset(self):
        pass

    def seed(self, seed=None):
        if seed is not None:
            self.key = jax.random.PRNGKey(seed)
        return [seed]


class LatentCEMAgent(CEMAgent):
    """CEM over learned latent models, batched like PlaNet
    (reference: cross_entropy_method/pytorch.py:20-44). ``transition_model``
    and ``reward_model`` are pure jnp callables."""

    def __init__(self, env, config=None, transition_model: Callable = None,
                 reward_model: Callable = None):
        super().__init__(env, config)
        self.transition_model = transition_model
        self.reward_model = reward_model
        self._plan = self._build_plan()

    def _build_plan(self):
        horizon = self.config["horizon"]
        candidates = self.config["candidates"]
        top_candidates = self.config["top_candidates"]
        iterations = self.config["iterations"]
        action_size = self.action_size
        transition_model, reward_model = self.transition_model, self.reward_model

        @jax.jit
        def plan(belief, state, key):
            belief = jnp.broadcast_to(belief, (candidates,) + belief.shape[-1:])
            state = jnp.broadcast_to(state, (candidates,) + state.shape[-1:])

            def iteration(carry, _):
                mean, std, key = carry
                key, ks = jax.random.split(key)
                actions = mean[None] + std[None] * jax.random.normal(
                    ks, (candidates, horizon, action_size))

                def body(carry, t):
                    b, s = carry
                    nb, ns = transition_model(s, actions[:, t], b)
                    r = reward_model(nb, ns)
                    return (nb, ns), r

                (_, _), rewards = jax.lax.scan(body, (belief, state), jnp.arange(horizon))
                returns = rewards.sum(axis=0)
                _, topk = jax.lax.top_k(returns, top_candidates)
                best = actions[topk]
                return (best.mean(axis=0), best.std(axis=0), key), None

            init = (jnp.zeros((horizon, action_size)), jnp.ones((horizon, action_size)), key)
            (mean, _, _), _ = jax.lax.scan(iteration, init, None, length=iterations)
            return mean[0]

        return plan

    def plan(self, belief, state):
        self.key, sub = jax.random.split(self.key)
        return np.asarray(self._plan(jnp.asarray(belief), jnp.asarray(state), sub)).tolist()
