"""Optimizer and loss factories on optax.

Rebuild of the reference (rl_agents/agents/common/optimizers.py:8-166):
ADAM / RMS_PROP / RANGER (RAdam + LARS trust-ratio, optimizers.py:8-142,
lookahead left disabled as in the reference) and the l2/l1/smooth_l1/bce
loss functions.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def loss_function_factory(loss_function: str):
    if loss_function == "l2":
        return lambda pred, target: jnp.mean((pred - target) ** 2)
    elif loss_function == "l1":
        return lambda pred, target: jnp.mean(jnp.abs(pred - target))
    elif loss_function == "smooth_l1":
        return lambda pred, target: jnp.mean(optax.huber_loss(pred, target))
    elif loss_function == "bce":
        return lambda pred, target: jnp.mean(optax.sigmoid_binary_cross_entropy(pred, target))
    raise ValueError(f"Unknown loss function: {loss_function}")


def optimizer_factory(optimizer_type: str, lr: float = 5e-4, weight_decay: float = 0.0,
                      **kwargs) -> optax.GradientTransformation:
    if optimizer_type == "ADAM":
        return optax.adamw(lr, weight_decay=weight_decay) if weight_decay else optax.adam(lr)
    elif optimizer_type == "RMS_PROP":
        return optax.rmsprop(lr)
    elif optimizer_type == "RANGER":
        # RAdam rescaling + layerwise LARS trust ratio (reference Ranger core)
        chain = [optax.scale_by_radam(), optax.scale_by_trust_ratio()]
        if weight_decay:
            chain.insert(0, optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale(-lr))
        return optax.chain(*chain)
    raise ValueError(f"Unknown optimizer type: {optimizer_type}")
