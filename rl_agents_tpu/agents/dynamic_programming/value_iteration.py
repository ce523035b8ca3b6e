"""Value Iteration agent on finite MDPs.

Rebuild of the reference agent (dynamic_programming/value_iteration.py:9-111):
reads the environment's MDP view, solves Q* with the jitted Bellman fixed
point (bellman.py), and acts greedily. Environments expose their model either
as ``env.mdp`` (the FiniteMDP functional env) or via ``to_finite_mdp()``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.agents.dynamic_programming.bellman import (
    BellmanModel,
    plan_trajectory,
    state_action_value,
)


def mdp_view(env):
    """Extract a BellmanModel + mode from an environment's MDP interface."""
    if hasattr(env, "mdp") and env.mdp is not None:
        mdp = env.mdp
    elif hasattr(env, "unwrapped") and hasattr(env.unwrapped, "to_finite_mdp"):
        mdp = env.unwrapped.to_finite_mdp()
    elif hasattr(env, "to_finite_mdp"):
        mdp = env.to_finite_mdp()
    else:
        raise TypeError(
            "Environment must expose a finite MDP (env.mdp) or a to_finite_mdp() conversion")
    model = BellmanModel(
        transition=jnp.asarray(mdp.transition),
        reward=jnp.asarray(mdp.reward, jnp.float32),
        terminal=jnp.asarray(mdp.terminal, bool),
        next=jnp.asarray(getattr(mdp, "next", np.zeros((), np.int32))),
    )
    return model, mdp.mode, mdp


class ValueIterationAgent(AbstractAgent):
    def __init__(self, env, config=None):
        super().__init__(config)
        self.env = env
        self.model, self.mode, self.mdp = mdp_view(env)
        self.rederive_each_act = not hasattr(env, "mdp") or env.mdp is None
        self.state_action_value = self.get_state_action_value()

    @classmethod
    def default_config(cls):
        return dict(gamma=1.0, iterations=100)

    def get_state_value(self):
        return np.asarray(jnp.max(self.state_action_value, axis=-1))

    def get_state_action_value(self):
        return np.asarray(state_action_value(
            self.model, self.config["gamma"], self.mode, self.config["iterations"]))

    def act(self, state):
        if self.rederive_each_act:
            # non-finite envs re-derive the MDP around the current state
            # (reference: value_iteration.py:29-35)
            self.model, self.mode, self.mdp = mdp_view(self.env)
            state = self.mdp.state if hasattr(self.mdp, "state") else state
            self.state_action_value = self.get_state_action_value()
        if np.ndim(state) > 0 and hasattr(self.mdp, "state"):
            # feature-vector observation: the MDP view tracks the index
            # (e.g. the sailing accessor; reference: value_iteration.py:33-35
            # reads mdp.state the same way after to_finite_mdp)
            state = self.mdp.state
        return int(np.argmax(self.state_action_value[int(state), :]))

    def plan_trajectory(self, state, horizon: int = 10):
        states, actions = plan_trajectory(
            self.model, jnp.asarray(self.state_action_value), jnp.asarray(state),
            self.mode, horizon)
        states = [int(s) for s in np.asarray(states) if s >= 0]
        actions = [int(a) for a in np.asarray(actions) if a >= 0]
        return states, actions

    def record(self, state, action, reward, next_state, done, info):
        pass

    def reset(self):
        pass

    def seed(self, seed=None):
        pass
