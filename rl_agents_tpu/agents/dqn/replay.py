"""Replay memory as preallocated device arrays with a ring index.

Rebuild of the reference's list-based ReplayMemory
(rl_agents/agents/common/memory.py:6-86) — including n-step collapse
(memory.py:37-77) — but stored as fixed-capacity jnp arrays so minibatch
sampling is a device gather with no host churn. The fused actor-learner
(parallel/actor_learner.py) uses the same layout fully in-graph.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Batch(NamedTuple):
    state: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    next_state: jnp.ndarray
    terminal: jnp.ndarray


@partial(jax.jit, donate_argnums=(0,), static_argnames=())
def _write(data: Batch, pos, state, action, reward, next_state, terminal) -> Batch:
    return Batch(
        state=data.state.at[pos].set(state),
        action=data.action.at[pos].set(action),
        reward=data.reward.at[pos].set(reward),
        next_state=data.next_state.at[pos].set(next_state),
        terminal=data.terminal.at[pos].set(terminal),
    )


@partial(jax.jit, static_argnames=("batch_size",))
def _sample(data: Batch, key, size, batch_size: int) -> Batch:
    idx = jax.random.randint(key, (batch_size,), 0, size)
    return jax.tree.map(lambda x: x[idx], data)


def n_step_collapse(data: Batch, start, size, n_steps: int, gamma,
                    stride: int = 1) -> Batch:
    """Collapse n consecutive same-trajectory transitions starting at each
    ``start`` index into <s0, a0, sum(gamma^i r_i), s_n, done_n>, stopping
    at terminals (reference: memory.py:58-77). ``stride`` is the ring
    distance between consecutive same-env transitions: 1 for the object-path
    replay, ``num_envs`` for the fused actor-learner's interleaved ring
    (step t of env e lands at position t*E + e, so step t+1 sits exactly E
    rows later). Traceable — usable inside larger jitted programs."""
    batch_size = start.shape[0]
    offsets = jnp.arange(n_steps) * stride
    idx = jnp.minimum(start[:, None] + offsets[None, :], size - 1)  # [B, n]
    rewards = data.reward[idx]
    terminals = data.terminal[idx]
    # alive[b, i]: transition i contributes (no terminal strictly before it)
    prior_terminal = jnp.cumsum(jnp.pad(terminals[:, :-1], ((0, 0), (1, 0))), axis=1) > 0
    alive = ~prior_terminal
    discounts = gamma ** jnp.arange(n_steps, dtype=jnp.float32)
    cum_reward = jnp.sum(rewards * discounts[None, :] * alive, axis=1)
    # last contributing index per row
    last = jnp.maximum(jnp.sum(alive, axis=1) - 1, 0)
    last_idx = idx[jnp.arange(batch_size), last]
    return Batch(
        state=data.state[start],
        action=data.action[start],
        reward=cum_reward,
        next_state=data.next_state[last_idx],
        terminal=data.terminal[last_idx],
    )


@partial(jax.jit, static_argnames=("batch_size", "n_steps"))
def _sample_n_step(data: Batch, key, size, batch_size: int, n_steps: int, gamma) -> Batch:
    """Sample start indices and collapse (reference: memory.py:58-77)."""
    start = jax.random.randint(key, (batch_size,), 0, size)
    return n_step_collapse(data, start, size, n_steps, gamma)


class ReplayMemory:
    def __init__(self, capacity: int, obs_shape, n_steps: int = 1, gamma: float = 0.99,
                 obs_dtype=jnp.float32):
        self.capacity = int(capacity)
        self.n_steps = n_steps
        self.gamma = gamma
        self.position = 0
        self.size = 0
        self.data = Batch(
            state=jnp.zeros((self.capacity,) + tuple(obs_shape), obs_dtype),
            action=jnp.zeros((self.capacity,), jnp.int32),
            reward=jnp.zeros((self.capacity,), jnp.float32),
            next_state=jnp.zeros((self.capacity,) + tuple(obs_shape), obs_dtype),
            terminal=jnp.zeros((self.capacity,), bool),
        )

    def push(self, state, action, reward, next_state, terminal, info=None):
        self.data = _write(self.data, self.position,
                           jnp.asarray(state, self.data.state.dtype), int(action),
                           float(reward), jnp.asarray(next_state, self.data.state.dtype),
                           bool(terminal))
        self.position = (self.position + 1) % self.capacity
        self.size = min(self.size + 1, self.capacity)

    def sample(self, key, batch_size: int) -> Batch:
        if self.n_steps == 1:
            return _sample(self.data, key, self.size, batch_size)
        return _sample_n_step(self.data, key, self.size, batch_size, self.n_steps,
                              jnp.float32(self.gamma))

    def __len__(self):
        return self.size

    def is_full(self):
        return self.size == self.capacity

    def is_empty(self):
        return self.size == 0

    def state_dict(self):
        return {"data": jax.tree.map(np.asarray, self.data),
                "position": self.position, "size": self.size}

    def load_state_dict(self, d):
        self.data = jax.tree.map(jnp.asarray, d["data"])
        self.position = d["position"]
        self.size = d["size"]
