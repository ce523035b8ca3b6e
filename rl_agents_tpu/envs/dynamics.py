"""Functional double-integrator dynamics environment.

Rebuild of the reference's DynamicsEnv (utils/envs/dynamics.py:6-31): linear
system x' = Ax + Bu with bang-bang discrete action, reward max(1 - x0^2, 0).
Also used by the robust EPC agents as the true linear plant.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut


class DynParams(NamedTuple):
    A: Any
    B: Any


class DynState(NamedTuple):
    x: Any  # (2,)
    t: Any


class DynamicsEnv(FunctionalEnv):
    def __init__(self, dt: float = 0.1, max_episode_steps: int = 100):
        self.dt = dt
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec("dynamics", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        return Box(-np.inf, np.inf, (2,))

    def default_params(self):
        dt = self.dt
        return DynParams(A=jnp.array([[1.0, dt], [0.0, 1.0]]), B=jnp.array([0.0, dt]))

    def reset(self, params, key):
        state = DynState(jnp.array([-1.0, 0.0]), jnp.zeros((), jnp.int32))
        return state, state.x

    def observe(self, params, state):
        return state.x

    def step(self, params: DynParams, state: DynState, action, key) -> StepOut:
        u = 2.0 * action - 1.0
        x = params.A @ state.x + params.B * u
        reward = jnp.maximum(1.0 - x[0] ** 2, 0.0)
        t = state.t + 1
        new_state = DynState(x, t)
        return StepOut(new_state, x, reward, jnp.zeros((), bool), t >= self.max_episode_steps, {})


class ContinuousDynamicsEnv(DynamicsEnv):
    """Box-action variant: u in [-1, 1] directly (the reference's CEM plans
    over continuous action spaces, cross_entropy_method/cem.py:16-18)."""

    @property
    def action_space(self):
        return Box(np.float32(-1.0), np.float32(1.0), (1,))

    def step(self, params: DynParams, state: DynState, action, key) -> StepOut:
        u = jnp.clip(jnp.ravel(jnp.atleast_1d(action))[0], -1.0, 1.0)
        x = params.A @ state.x + params.B * u
        reward = jnp.maximum(1.0 - x[0] ** 2, 0.0)
        t = state.t + 1
        new_state = DynState(x, t)
        return StepOut(new_state, x, reward, jnp.zeros((), bool), t >= self.max_episode_steps, {})


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    cls = ContinuousDynamicsEnv if config.get("continuous") else DynamicsEnv
    env = cls(dt=config.get("dt", 0.1), max_episode_steps=config.get("max_episode_steps", 100))
    return EnvHandle(env, env.default_params(), config)
