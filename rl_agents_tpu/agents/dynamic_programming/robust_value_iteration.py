"""Robust Value Iteration over a finite ambiguity set of MDP models.

Rebuild of the reference agent (dynamic_programming/robust_value_iteration.py:6-73):
the worst case over M models is a min over a leading model axis, composed
inside the Bellman fixed point — here one vmapped jit program (bellman.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.agents.dynamic_programming.bellman import (
    BellmanModel,
    robust_state_action_value,
)


class RobustValueIterationAgent(AbstractAgent):
    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        self.models_from_config()
        self.state_action_value = self.get_state_action_value()

    @classmethod
    def default_config(cls):
        return dict(gamma=1.0, iterations=100, models=[])

    def models_from_config(self):
        models = self.config.get("models")
        if not models:
            raise ValueError("No finite MDP model provided in agent configuration")
        self.mode = models[0]["mode"]
        transitions = np.array([m["transition"] for m in models])
        rewards = np.array([m["reward"] for m in models], dtype=np.float32)
        M, S, A = rewards.shape
        # the corpus spells per-state terminals as single-element rows
        # ([[0],[0],[1],[1]], FiniteMDPEnv/anti_vi) — flatten and pad to [S]
        # (same clamping as finite_mdp.params_from_config)
        def _terminal(m):
            flat = np.asarray(m.get("terminal", np.zeros(S)), dtype=bool).reshape(-1)
            out = np.zeros(S, bool)
            out[:min(S, flat.shape[0])] = flat[:S]
            return out

        terminals = np.array([_terminal(m) for m in models], dtype=bool)
        if self.mode == "deterministic":
            transitions = transitions.astype(np.int32)
        self.models = BellmanModel(
            transition=jnp.asarray(transitions), reward=jnp.asarray(rewards),
            terminal=jnp.asarray(terminals), next=jnp.zeros((), jnp.int32))

    def get_state_action_value(self):
        return np.asarray(robust_state_action_value(
            self.models, self.config["gamma"], self.mode, self.config["iterations"]))

    def get_state_value(self):
        return np.asarray(np.max(self.state_action_value, axis=-1))

    def act(self, state):
        return int(np.argmax(self.state_action_value[int(state), :]))

    def record(self, state, action, reward, next_state, done, info):
        pass

    def reset(self):
        pass

    def seed(self, seed=None):
        pass
