"""Finite MDP environment with deterministic / stochastic / sparse transition modes.

Functional rebuild of the ``finite_mdp`` environment the reference's Value
Iteration agents consume (reference: dynamic_programming/value_iteration.py:51-63
reads ``mdp.transition/reward/terminal/mode``; configs in
scripts/configs/FiniteMDPEnv/*.json carry inline matrices).

The three transition encodings become one params pytree; the mode is static
structure so jit specialises the Bellman gather/matmul per mode:

* ``deterministic``: transition[S, A] -> next-state index
* ``stochastic``:    transition[S, A, S] -> probability
* ``sparse``:        next[S, A, K] indices + transition[S, A, K] probabilities
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut


class MDPParams(NamedTuple):
    transition: Any   # [S,A] int / [S,A,S] float / [S,A,K] float
    reward: Any       # [S,A]
    terminal: Any     # [S] bool
    next: Any         # [S,A,K] int (sparse mode only; else scalar 0)
    initial_state: Any  # [] int


class MDPState(NamedTuple):
    s: Any   # current state index
    t: Any   # step counter
    done: Any


class FiniteMDPEnv(FunctionalEnv):
    def __init__(self, num_states: int, num_actions: int, mode: str = "deterministic",
                 max_episode_steps: int = 100):
        if mode not in ("deterministic", "stochastic", "sparse"):
            raise ValueError(f"Unknown mode {mode}")
        self.num_states = num_states
        self.num_actions = num_actions
        self.mode = mode
        self.max_episode_steps = max_episode_steps
        self.spec = EnvSpec("finite-mdp", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(self.num_actions)

    @property
    def observation_space(self):
        return Discrete(self.num_states)

    def default_params(self) -> MDPParams:
        S, A = self.num_states, self.num_actions
        if self.mode == "deterministic":
            transition = jnp.zeros((S, A), jnp.int32)
        else:
            transition = jnp.ones((S, A, S), jnp.float32) / S
        return MDPParams(
            transition=transition,
            reward=jnp.zeros((S, A), jnp.float32),
            terminal=jnp.zeros((S,), bool),
            next=jnp.zeros((), jnp.int32),
            initial_state=jnp.zeros((), jnp.int32),
        )

    def reset(self, params: MDPParams, key):
        state = MDPState(s=params.initial_state, t=jnp.zeros((), jnp.int32),
                         done=jnp.zeros((), bool))
        return state, state.s

    def observe(self, params, state: MDPState):
        return state.s

    def next_state(self, params: MDPParams, s, action, key):
        if self.mode == "deterministic":
            return params.transition[s, action]
        elif self.mode == "stochastic":
            return jax.random.categorical(key, jnp.log(jnp.maximum(params.transition[s, action], 1e-30)))
        else:
            k = jax.random.categorical(key, jnp.log(jnp.maximum(params.transition[s, action], 1e-30)))
            return params.next[s, action, k]

    def step(self, params: MDPParams, state: MDPState, action, key) -> StepOut:
        reward = jnp.where(state.done, 0.0, params.reward[state.s, action])
        s_next = jnp.where(state.done, state.s, self.next_state(params, state.s, action, key))
        t = state.t + 1
        terminated = params.terminal[s_next] | state.done
        truncated = t >= self.max_episode_steps
        new_state = MDPState(s=s_next, t=t, done=terminated)
        return StepOut(new_state, s_next, reward, terminated, truncated, {})


def params_from_config(config: dict) -> tuple[FiniteMDPEnv, MDPParams]:
    mode = config.get("mode", "deterministic")
    transition = np.asarray(config["transition"])
    reward = np.asarray(config["reward"], dtype=np.float32)
    S, A = reward.shape
    # clamp to S states: the reference corpus's env_bandit.json declares one
    # state but a per-action-length terminal list (upstream sloppiness that
    # its dict-based env never noticed; array shapes do)
    terminal_cfg = np.asarray(config.get("terminal", np.zeros(S)), dtype=bool).reshape(-1)
    terminal = np.zeros(S, bool)
    terminal[:min(S, terminal_cfg.shape[0])] = terminal_cfg[:S]
    # the reference corpus spells the horizon "max_steps"
    # (scripts/configs/FiniteMDPEnv/**/env*.json)
    max_steps = config.get("max_episode_steps", config.get("max_steps", 100))
    env = FiniteMDPEnv(S, A, mode=mode, max_episode_steps=max_steps)
    if mode == "deterministic":
        transition = transition.astype(np.int32)
        nxt = np.zeros((), np.int32)
    elif mode == "stochastic":
        transition = transition.astype(np.float32)
        nxt = np.zeros((), np.int32)
    else:
        transition = transition.astype(np.float32)
        nxt = np.asarray(config["next"], dtype=np.int32)
    params = MDPParams(
        transition=jnp.asarray(transition),
        reward=jnp.asarray(reward),
        terminal=jnp.asarray(terminal),
        next=jnp.asarray(nxt),
        initial_state=jnp.asarray(config.get("initial_state", 0), jnp.int32),
    )
    return env, params


def garnet(key, num_states: int, num_actions: int, branching: int = 2,
           reward_sparsity: float = 0.5) -> tuple[FiniteMDPEnv, MDPParams]:
    """Random Garnet MDP generator (sparse mode)."""
    k1, k2, k3 = jax.random.split(key, 3)
    nxt = jax.random.randint(k1, (num_states, num_actions, branching), 0, num_states)
    probs = jax.random.dirichlet(k2, jnp.ones(branching), (num_states, num_actions))
    reward = jax.random.uniform(k3, (num_states, num_actions))
    reward = reward * (reward < (1 - reward_sparsity)).astype(jnp.float32)
    env = FiniteMDPEnv(num_states, num_actions, mode="sparse")
    params = MDPParams(
        transition=probs.astype(jnp.float32), reward=reward.astype(jnp.float32),
        terminal=jnp.zeros((num_states,), bool), next=nxt.astype(jnp.int32),
        initial_state=jnp.zeros((), jnp.int32),
    )
    return env, params


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    if "transition" in config:
        env, params = params_from_config(config)
    elif config.get("generator") == "garnet":
        env, params = garnet(jax.random.PRNGKey(config.get("seed", 0)),
                             config.get("num_states", 16), config.get("num_actions", 4),
                             config.get("branching", 2))
    else:
        # default small loop MDP (reference scripts/configs/FiniteMDPEnv/env_loop.json shape)
        env, params = params_from_config({
            "mode": "deterministic",
            "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
            "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
            "terminal": [0, 0, 0, 0],
        })
    handle = EnvHandle(env, params, config)
    handle.mdp = MDPAccessor(env, params)
    return handle


class MDPAccessor:
    """Duck-typed ``env.mdp`` view for the Value Iteration agents
    (reference: value_iteration.py:14 reads env.mdp.{transition,reward,terminal,mode})."""

    def __init__(self, env: FiniteMDPEnv, params: MDPParams):
        self.mode = env.mode
        self.env = env
        self.params = params
        self.transition = np.asarray(params.transition)
        self.reward = np.asarray(params.reward)
        self.terminal = np.asarray(params.terminal)
        self.next = np.asarray(params.next)

    def next_state(self, s, a, key=None):
        if self.mode == "deterministic":
            return int(self.transition[s, a])
        return int(self.env.next_state(self.params, s, a, key if key is not None else jax.random.PRNGKey(0)))
