"""Simple baseline agents (rebuild of reference rl_agents/agents/simple/)."""
from __future__ import annotations

import jax
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.envs.base import Box, Discrete


class RandomUniformAgent(AbstractAgent):
    """Uniformly random actions (reference: simple/random.py)."""

    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        self.key = jax.random.PRNGKey(0)

    def act(self, state):
        self.key, sub = jax.random.split(self.key)
        space = self.env.action_space
        if isinstance(space, Discrete):
            return int(jax.random.randint(sub, (), 0, space.n))
        elif isinstance(space, Box):
            return np.asarray(space.sample(sub))
        return space.sample()

    def record(self, state, action, reward, next_state, done, info):
        pass

    def reset(self):
        pass

    def seed(self, seed=None):
        if seed is not None:
            self.key = jax.random.PRNGKey(seed)
        return [seed]


class OpenLoopAgent(AbstractAgent):
    """Replays a configured action sequence (reference: simple/open_loop.py)."""

    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        self.t = 0

    @classmethod
    def default_config(cls):
        return dict(actions=[0])

    def act(self, state):
        actions = self.config["actions"]
        action = actions[min(self.t, len(actions) - 1)]
        self.t += 1
        return action

    def plan(self, state):
        return self.config["actions"][self.t:] or [self.config["actions"][-1]]

    def record(self, state, action, reward, next_state, done, info):
        pass

    def reset(self):
        self.t = 0

    def seed(self, seed=None):
        return [seed]

    def set_time(self, time):
        self.t = time
