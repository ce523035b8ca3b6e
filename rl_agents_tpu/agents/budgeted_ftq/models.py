"""Budgeted Q-network: (state, budget) -> (Qr, Qc) per action.

Rebuild of the reference BudgetedMLP (budgeted_ftq/models.py:6-57): the budget
beta passes through its own encoder branch, is concatenated with the state,
and the head predicts 2*n_actions outputs (Qr then Qc blocks).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from rl_agents_tpu.models.zoo import activation_factory, _dense


class BudgetedMLP(nn.Module):
    size_state: int
    n_actions: int
    layers: Sequence[int] = (64, 64)
    size_beta_encoder: int = 10
    beta_encoder_type: str = "LINEAR"
    activation_type: str = "RELU"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [batch, size_state + 1]; last column is the budget beta."""
        act = activation_factory(self.activation_type)
        state, beta = x[:, :-1], x[:, -1:]
        if self.size_beta_encoder > 1:
            if self.beta_encoder_type == "LINEAR":
                beta = _dense(self.size_beta_encoder, self.dtype, name="beta_encoder")(beta)
            elif self.beta_encoder_type == "REPEAT":
                beta = jnp.repeat(beta, self.size_beta_encoder, axis=1)
            else:
                raise ValueError(f"Unknown encoder type: {self.beta_encoder_type}")
            h = jnp.concatenate([state, beta], axis=1)
        elif self.size_beta_encoder == 1:
            h = x
        else:
            h = state
        for size in self.layers:
            h = act(_dense(size, self.dtype)(h))
        return _dense(2 * self.n_actions, self.dtype, name="predict")(h)
