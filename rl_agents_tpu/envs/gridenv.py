"""Functional GridEnv and LineEnv test environments.

Rebuilds of the reference's toy planning substrates
(reference: utils/envs/gridenv.py:6-117): a 2-D random walk with a radial
reward bump (GridEnv) and a noisy 1-D line with terminal walls (LineEnv).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut

REWARD_CENTER = jnp.array([10.0, 10.0])
REWARD_RADIUS = 5.0

# displacement per action: right, left, up, down, then 4 diagonals
_GRID_MOVES = jnp.array(
    [[1, 0], [-1, 0], [0, 1], [0, -1], [1, 1], [1, -1], [-1, 1], [-1, -1]],
    jnp.float32,
)


class GridState(NamedTuple):
    x: Any  # (2,) position
    t: Any


class GridEnv(FunctionalEnv):
    def __init__(self, use_diagonals: bool = False, stochasticity: float = 0.0,
                 max_episode_steps: int = 100):
        self.use_diagonals = use_diagonals
        self.stochasticity = stochasticity
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec("gridenv", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(8 if self.use_diagonals else 4)

    @property
    def observation_space(self):
        return Box(-np.inf, np.inf, (2,))

    def default_params(self):
        return {"stochasticity": jnp.float32(self.stochasticity)}

    def reset(self, params, key):
        state = GridState(jnp.zeros(2, jnp.float32), jnp.zeros((), jnp.int32))
        return state, state.x

    def observe(self, params, state):
        return state.x

    def step(self, params, state: GridState, action, key) -> StepOut:
        # with prob `stochasticity` the action is dropped (no move),
        # mirroring the reference's action = -1 branch (gridenv.py:27-29)
        drop = jax.random.uniform(key) < params["stochasticity"]
        move = jnp.where(drop, jnp.zeros(2), _GRID_MOVES[action])
        x = state.x + move
        reward = jnp.clip(
            1.0 - jnp.sum((REWARD_CENTER - x) ** 2) / REWARD_RADIUS**2, 0.0, 1.0)
        t = state.t + 1
        new_state = GridState(x, t)
        return StepOut(new_state, x, reward, jnp.zeros((), bool), t >= self.max_episode_steps, {})


class LineState(NamedTuple):
    x: Any
    t: Any
    done: Any


class LineEnv(FunctionalEnv):
    """Noisy 1-D walk; reward 1 while |x|<=1, terminal at |x|>=2
    (reference: gridenv.py:69-105; registered with max_episode_steps=10)."""

    def __init__(self, max_episode_steps: int = 10):
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec("line_env", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        return Box(-np.inf, np.inf, ())

    def default_params(self):
        return {}

    def reset(self, params, key):
        state = LineState(jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        return state, state.x

    def observe(self, params, state):
        return state.x

    def step(self, params, state: LineState, action, key) -> StepOut:
        delta = jnp.where(action == 1, 1, -1)
        noise = 2 * jax.random.randint(key, (), 0, 2) - 1
        x = state.x + jnp.floor_divide(delta + noise, 2)
        done = state.done | (jnp.abs(x) >= 2)
        reward = jnp.where(state.done, 0.0, jnp.where(jnp.abs(x) <= 1, 1.0, 0.0))
        t = state.t + 1
        new_state = LineState(jnp.where(state.done, state.x, x), t, done)
        return StepOut(new_state, new_state.x, reward, done, t >= self.max_episode_steps, {})


def make_grid(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = GridEnv(use_diagonals=config.get("use_diagonals", False),
                  stochasticity=config.get("stochasticity", 0.0),
                  max_episode_steps=config.get("max_episode_steps", 100))
    return EnvHandle(env, env.default_params(), config)


def make_line(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = LineEnv(max_episode_steps=config.get("max_episode_steps", 10))
    return EnvHandle(env, env.default_params(), config)
