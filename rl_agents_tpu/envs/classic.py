"""Functional classic-control environments: MountainCar and Pendulum.

The reference's config corpus covers MountainCarEnv and Pendulum via gym
(scripts/configs/{MountainCarEnv,Pendulum}); these are the standard
gymnasium dynamics as pure jnp transitions so planners/DQN run them
on-device (the gym bridge remains available for the real renderers).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut


class MountainCarState(NamedTuple):
    position: Any
    velocity: Any
    t: Any
    done: Any


class MountainCarEnv(FunctionalEnv):
    """gymnasium MountainCar-v0 dynamics."""

    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec("mountaincar", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(3)

    @property
    def observation_space(self):
        return Box(np.array([-1.2, -0.07], np.float32),
                   np.array([0.6, 0.07], np.float32), (2,))

    def default_params(self):
        return {"force": jnp.float32(0.001), "gravity": jnp.float32(0.0025),
                "goal_position": jnp.float32(0.5)}

    def reset(self, params, key):
        position = jax.random.uniform(key, (), minval=-0.6, maxval=-0.4)
        state = MountainCarState(position, jnp.zeros(()), jnp.zeros((), jnp.int32),
                                 jnp.zeros((), bool))
        return state, self.observe(params, state)

    def observe(self, params, state):
        return jnp.stack([state.position, state.velocity])

    def step(self, params, state: MountainCarState, action, key) -> StepOut:
        velocity = state.velocity + (action - 1) * params["force"] \
            + jnp.cos(3 * state.position) * (-params["gravity"])
        velocity = jnp.clip(velocity, -0.07, 0.07)
        position = jnp.clip(state.position + velocity, -1.2, 0.6)
        velocity = jnp.where((position <= -1.2) & (velocity < 0), 0.0, velocity)
        t = state.t + 1
        terminated = (position >= params["goal_position"]) | state.done
        reward = jnp.where(state.done, 0.0, -1.0)
        new_state = MountainCarState(position, velocity, t, terminated)
        return StepOut(new_state, self.observe(params, new_state), reward,
                       terminated, t >= self.max_episode_steps, {})


class PendulumState(NamedTuple):
    theta: Any
    theta_dot: Any
    t: Any


class PendulumEnv(FunctionalEnv):
    """gymnasium Pendulum-v1 dynamics, with an optional discretised action set
    so discrete planners can drive it (torques linspace(-2, 2, n))."""

    def __init__(self, max_episode_steps: int = 200, discrete_actions: int = 5):
        self.max_episode_steps = max_episode_steps
        self.discrete_actions = discrete_actions
        self.spec = EnvSpec("pendulum", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(self.discrete_actions)

    @property
    def observation_space(self):
        return Box(np.array([-1, -1, -8], np.float32),
                   np.array([1, 1, 8], np.float32), (3,))

    def default_params(self):
        return {"g": jnp.float32(10.0), "m": jnp.float32(1.0), "l": jnp.float32(1.0),
                "dt": jnp.float32(0.05), "max_torque": jnp.float32(2.0)}

    def reset(self, params, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), minval=-jnp.pi, maxval=jnp.pi)
        theta_dot = jax.random.uniform(k2, (), minval=-1.0, maxval=1.0)
        state = PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def observe(self, params, state):
        return jnp.stack([jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot])

    def step(self, params, state: PendulumState, action, key) -> StepOut:
        torques = jnp.linspace(-params["max_torque"], params["max_torque"],
                               self.discrete_actions)
        u = torques[action]
        g, m, l, dt = params["g"], params["m"], params["l"], params["dt"]
        th = ((state.theta + jnp.pi) % (2 * jnp.pi)) - jnp.pi
        cost = th ** 2 + 0.1 * state.theta_dot ** 2 + 0.001 * u ** 2
        theta_dot = state.theta_dot + (3 * g / (2 * l) * jnp.sin(state.theta)
                                       + 3.0 / (m * l ** 2) * u) * dt
        theta_dot = jnp.clip(theta_dot, -8.0, 8.0)
        theta = state.theta + theta_dot * dt
        t = state.t + 1
        new_state = PendulumState(theta, theta_dot, t)
        # normalized to [0, 1] for bound-based planners
        reward = 1.0 - cost / (jnp.pi ** 2 + 0.1 * 64 + 0.001 * 4)
        return StepOut(new_state, self.observe(params, new_state), reward,
                       jnp.zeros((), bool), t >= self.max_episode_steps, {})


def make_mountaincar(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = MountainCarEnv(max_episode_steps=config.get("max_episode_steps", 200))
    return EnvHandle(env, env.default_params(), config)


def make_pendulum(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = PendulumEnv(max_episode_steps=config.get("max_episode_steps", 200),
                      discrete_actions=config.get("discrete_actions", 5))
    return EnvHandle(env, env.default_params(), config)
