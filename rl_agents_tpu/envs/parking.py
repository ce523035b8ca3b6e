"""Functional goal-conditioned parking environment (parking-v0 surrogate).

The reference's ParkingEnv configs (scripts/configs/ParkingEnv/*.json) run
the CEM planner and the simple agents on highway-env's ``parking-v0``: a
kinematic car must reach a goal pose; the reward is the negative weighted
p-norm between the achieved and desired goal features
(highway-env parking_env.py: ``-np.power(np.dot(np.abs(achieved - desired),
weights), p)`` with p=0.5), success when the reward exceeds a threshold.

Surrogate: kinematic bicycle with continuous [acceleration, steering] in
[-1, 1]^2; observation is the flat [achieved_goal, desired_goal] vector (the
env-as-oracle planners only consume step rewards, so the dict-obs HER
structure of the original is collapsed to its planning-relevant core).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, EnvHandle, EnvSpec, FunctionalEnv, StepOut

# highway-env parking reward weights over [x, y, vx, vy, cos_h, sin_h]
_WEIGHTS = jnp.array([1.0, 0.3, 0.0, 0.0, 0.02, 0.02])
_P_NORM = 0.5
_SUCCESS_THRESHOLD = 0.12


class ParkingState(NamedTuple):
    x: Any
    y: Any
    heading: Any
    speed: Any
    goal: Any  # (3,) [gx, gy, gheading]
    t: Any


class ParkingEnv(FunctionalEnv):
    def __init__(self, max_episode_steps: int = 100, dt: float = 0.1):
        self.max_episode_steps = max_episode_steps
        self.dt = dt
        self.spec = EnvSpec("parking", max_episode_steps)

    @property
    def action_space(self):
        return Box(-1.0, 1.0, (2,))

    @property
    def observation_space(self):
        return Box(-np.inf, np.inf, (12,))

    def default_params(self):
        return {"accel_scale": jnp.float32(5.0),
                "steer_scale": jnp.float32(np.pi / 4)}

    def _features(self, state: ParkingState):
        vx = state.speed * jnp.cos(state.heading)
        vy = state.speed * jnp.sin(state.heading)
        return jnp.stack([state.x, state.y, vx, vy,
                          jnp.cos(state.heading), jnp.sin(state.heading)])

    def _goal_features(self, state: ParkingState):
        return jnp.stack([state.goal[0], state.goal[1], 0.0, 0.0,
                          jnp.cos(state.goal[2]), jnp.sin(state.goal[2])])

    def reset(self, params, key):
        kg, kh = jax.random.split(key)
        # goal pose in one of the parking rows (+-1 heading of pi/2)
        gx = jax.random.uniform(kg, (), minval=-20.0, maxval=20.0)
        up = jax.random.uniform(kh) < 0.5
        goal = jnp.stack([gx, jnp.where(up, 10.0, -10.0),
                          jnp.where(up, jnp.pi / 2, -jnp.pi / 2)])
        state = ParkingState(x=jnp.float32(0.0), y=jnp.float32(0.0),
                             heading=jnp.float32(0.0), speed=jnp.float32(0.0),
                             goal=goal, t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def observe(self, params, state: ParkingState):
        return jnp.concatenate([self._features(state), self._goal_features(state)])

    def step(self, params, state: ParkingState, action, key) -> StepOut:
        act = jnp.clip(jnp.ravel(jnp.atleast_1d(action)), -1.0, 1.0)
        accel = act[0] * params["accel_scale"]
        steering = act[1] * params["steer_scale"]
        dt = self.dt
        # kinematic bicycle (highway-env kinematics.py slip-angle model)
        beta = jnp.arctan(0.5 * jnp.tan(steering))
        speed = jnp.clip(state.speed + accel * dt, -10.0, 10.0)
        heading = state.heading + speed * jnp.sin(beta) / 2.5 * dt
        x = state.x + speed * jnp.cos(heading + beta) * dt
        y = state.y + speed * jnp.sin(heading + beta) * dt
        t = state.t + 1
        new_state = ParkingState(x=x, y=y, heading=heading, speed=speed,
                                 goal=state.goal, t=t)
        gap = jnp.abs(self._features(new_state) - self._goal_features(new_state))
        reward = -jnp.power(jnp.dot(gap, _WEIGHTS), _P_NORM)
        success = reward > -_SUCCESS_THRESHOLD
        return StepOut(new_state, self.observe(params, new_state), reward,
                       success, t >= self.max_episode_steps,
                       {"is_success": success})


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = ParkingEnv(max_episode_steps=config.get("max_episode_steps",
                                                  config.get("duration", 100)))
    return EnvHandle(env, env.default_params(), config)
