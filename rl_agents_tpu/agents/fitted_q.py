"""Fitted-Q iteration agent.

Rebuild of the reference FTQ (fitted_q/abstract.py:13-114, fitted_q/pytorch.py):
a batched agent (``batched=True`` routes Evaluation into batched collection,
evaluation.py:115-121) whose ``record`` only stores transitions; ``update()``
runs N value-iteration epochs (N = 3/(1-gamma) by default) of [hard target
sync -> model re-init -> M regression steps of minibatch SGD].

TPU-native: the inner regression loop is one jitted ``lax.scan`` over M
gradient steps with minibatch indices sampled in-graph — the whole fitted-Q
epoch executes as a single device program instead of M host round-trips.
"""
from __future__ import annotations

import logging
import pickle
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_agents_tpu.agents.dqn.agent import DQNAgent, TrainState
from rl_agents_tpu.agents.dqn.replay import Batch
from rl_agents_tpu.ops.onehot import select_action_values

logger = logging.getLogger(__name__)


def make_ftq_epoch(model, optimizer, gamma: float, double: bool,
                   regression_epochs: int, batch_size: int):
    """One fitted-Q value-iteration epoch as a single jitted program."""

    def loss_fn(params, target_params, batch: Batch):
        q = model.apply(params, batch.state)
        q_sa = select_action_values(q, batch.action)
        if double:
            best = jnp.argmax(model.apply(params, batch.next_state), axis=1)
            q_next = model.apply(target_params, batch.next_state)
            best_values = select_action_values(q_next, best)
        else:
            best_values = jnp.max(model.apply(target_params, batch.next_state), axis=1)
        target = batch.reward + gamma * jnp.where(batch.terminal, 0.0, best_values)
        return jnp.mean((q_sa - jax.lax.stop_gradient(target)) ** 2)

    @partial(jax.jit, static_argnames=())
    def epoch(params, target_params, opt_state, data: Batch, size, key):
        def regression_step(carry, k):
            params, opt_state = carry
            idx = jax.random.randint(k, (batch_size,), 0, size)
            batch = jax.tree.map(lambda x: x[idx], data)
            loss, grads = jax.value_and_grad(loss_fn)(params, target_params, batch)
            grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, regression_epochs)
        (params, opt_state), losses = jax.lax.scan(regression_step, (params, opt_state), keys)
        return params, opt_state, losses

    bellman_residual = jax.jit(loss_fn)
    return epoch, bellman_residual


class FTQAgent(DQNAgent):
    """(reference: fitted_q/abstract.py + fitted_q/pytorch.py)"""

    batched = True

    @classmethod
    def default_config(cls):
        cfg = super().default_config()
        cfg.update({
            "value_iteration_epochs": None,  # None -> 3/(1-gamma), "from-gamma" accepted
            "regression_epochs": 50,
            "processes": 1,
            "constraint_penalty": 0,
        })
        return cfg

    def __init__(self, env, config=None):
        super().__init__(env, config)
        self._epoch, self._bellman_residual = make_ftq_epoch(
            self.model, self.optimizer, self.config["gamma"], self.config["double"],
            self.config["regression_epochs"], 64)
        self.iterations_time = 0

    def record(self, state, action, reward, next_state, done, info):
        """Store only (reference: fitted_q/abstract.py:30-46); constraint
        penalty folded into the reward when configured."""
        if not self.training:
            return
        if self.config["constraint_penalty"] and info and "constraint" in info:
            reward = reward + self.config["constraint_penalty"] * info["constraint"]
        self.memory.push(state, action, reward, next_state, done, info)

    def update(self):
        """N value-iteration epochs x M regression steps
        (reference: fitted_q/abstract.py:48-81)."""
        epochs = self.config["value_iteration_epochs"]
        if not epochs or epochs == "from-gamma":
            epochs = int(3 / (1 - self.config["gamma"]))
        self.initialize_model()
        data, size = self.memory.data, self.memory.size
        for epoch_i in range(epochs):
            # hard target sync then re-fit from a fresh model
            self.train_state = self.train_state._replace(
                target_params=self.train_state.params)
            self.initialize_model()
            self.key, sub = jax.random.split(self.key)
            params, opt_state, losses = self._epoch(
                self.train_state.params, self.train_state.target_params,
                self.train_state.opt_state, data, size, sub)
            self.train_state = TrainState(params, self.train_state.target_params, opt_state)
            if self.writer:
                self.writer.add_scalar("agent/bellman_residual", float(losses[0]),
                                       self.iterations_time)
                self.writer.add_scalar("agent/regression_loss", float(losses[-1]),
                                       self.iterations_time)
                self.iterations_time += 1
            logger.debug("FTQ epoch %d/%d: residual %.4f -> %.4f",
                         epoch_i + 1, epochs, float(losses[0]), float(losses[-1]))

    def save(self, filename):
        path = super().save(filename)
        with open(Path(filename).with_suffix(".data"), "wb") as f:
            pickle.dump(self.memory.state_dict(), f)
        logger.info("Saved a replay memory of length %d", len(self.memory))
        return path

    def load(self, filename):
        path = super().load(filename)
        data_file = Path(filename).with_suffix(".data")
        if data_file.exists():
            with open(data_file, "rb") as f:
                self.memory.load_state_dict(pickle.load(f))
            logger.info("Loaded a replay memory of length %d", len(self.memory))
        return path
