"""Functional CartPole.

Classic cart-pole swing-up-avoidance control task with the standard gymnasium
dynamics (Euler integration of the pole/cart equations), rebuilt as a pure
jnp transition so planners can fork/vmap thousands of simulations (the
reference plans on gym CartPole via env deep-copies; tests
tests/agents/tree_search/test_mcts.py:6-20 and the DQN recipe README.md:66-67
use it as the behavioural baseline).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut


class CartPoleParams(NamedTuple):
    gravity: Any
    masscart: Any
    masspole: Any
    length: Any          # half pole length
    force_mag: Any
    tau: Any
    theta_threshold: Any
    x_threshold: Any


class CartPoleState(NamedTuple):
    x: Any
    x_dot: Any
    theta: Any
    theta_dot: Any
    t: Any
    done: Any


class CartPoleEnv(FunctionalEnv):
    def __init__(self, max_episode_steps: int = 200):
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec("cartpole", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        high = np.array([4.8, np.inf, 0.418, np.inf], dtype=np.float32)
        return Box(-high, high, (4,))

    def default_params(self) -> CartPoleParams:
        return CartPoleParams(
            gravity=jnp.float32(9.8), masscart=jnp.float32(1.0), masspole=jnp.float32(0.1),
            length=jnp.float32(0.5), force_mag=jnp.float32(10.0), tau=jnp.float32(0.02),
            theta_threshold=jnp.float32(12 * 2 * np.pi / 360), x_threshold=jnp.float32(2.4),
        )

    def reset(self, params, key):
        vals = jax.random.uniform(key, (4,), minval=-0.05, maxval=0.05)
        state = CartPoleState(vals[0], vals[1], vals[2], vals[3],
                              jnp.zeros((), jnp.int32), jnp.zeros((), bool))
        return state, self.observe(params, state)

    def observe(self, params, state: CartPoleState):
        return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot])

    def step(self, params: CartPoleParams, state: CartPoleState, action, key) -> StepOut:
        total_mass = params.masscart + params.masspole
        polemass_length = params.masspole * params.length
        force = jnp.where(action == 1, params.force_mag, -params.force_mag)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        temp = (force + polemass_length * state.theta_dot**2 * sintheta) / total_mass
        thetaacc = (params.gravity * sintheta - costheta * temp) / (
            params.length * (4.0 / 3.0 - params.masspole * costheta**2 / total_mass))
        xacc = temp - polemass_length * thetaacc * costheta / total_mass
        x = state.x + params.tau * state.x_dot
        x_dot = state.x_dot + params.tau * xacc
        theta = state.theta + params.tau * state.theta_dot
        theta_dot = state.theta_dot + params.tau * thetaacc
        t = state.t + 1
        terminated = ((jnp.abs(x) > params.x_threshold)
                      | (jnp.abs(theta) > params.theta_threshold)
                      | state.done)
        truncated = t >= self.max_episode_steps
        # gymnasium gives reward 1.0 on every step incl. the terminating one,
        # and 0 once already done.
        reward = jnp.where(state.done, 0.0, 1.0)
        new_state = CartPoleState(x, x_dot, theta, theta_dot, t, terminated)
        return StepOut(new_state, self.observe(params, new_state), reward, terminated, truncated, {})


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = CartPoleEnv(max_episode_steps=config.get("max_episode_steps", 200))
    return EnvHandle(env, env.default_params(), config)
