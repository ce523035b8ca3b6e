"""Budgeted Fitted-Q core.

Rebuild of the reference BudgetedFittedQ (budgeted_ftq/bftq.py:25-335): fit a
(Qr, Qc) model of state-budget-action values by repeated application of the
Budgeted Bellman Optimality operator. Per epoch:

1. forward all next states x the discretised budget grid (one batched pass,
   reference bftq.py:190-214)
2. per-state Pareto frontier of (Qc, Qr) and budget-constrained optimal
   mixture — vmapped device kernels (replacing the reference's per-state
   scipy hulls in a process pool, bftq.py:227-250)
3. targets r + gamma*Vr, c + gamma_c*Vc (bftq.py:129-148)
4. fit by full-batch gradient steps with [-1,1] grad clamping, optionally
   resetting the network each epoch (bftq.py:252-305)

The beta-duplication data augmentation on push (bftq.py:64-74) and the
"epoch 0 bootstraps zeros" rule (bftq.py:164-165) are preserved.
"""
from __future__ import annotations

import logging
import re
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_agents_tpu.agents.budgeted_ftq.greedy_policy import batch_mixtures
from rl_agents_tpu.models.optimizers import loss_function_factory, optimizer_factory

logger = logging.getLogger(__name__)


def parse_betas(value):
    """Parse a betas spec: a list, or the reference's "np.arange(0, 1, 0.1)" /
    "np.linspace(a, b, n)" strings (no eval; budgeted_ftq/bftq.py:331-335)."""
    if isinstance(value, (list, tuple, np.ndarray)):
        return np.asarray(value, dtype=np.float32)
    if isinstance(value, str):
        m = re.fullmatch(r"\s*np\.arange\(([^)]*)\)\s*", value)
        if m:
            args = [float(a) for a in m.group(1).split(",")]
            return np.arange(*args).astype(np.float32)
        m = re.fullmatch(r"\s*np\.linspace\(([^)]*)\)\s*", value)
        if m:
            args = [float(a) for a in m.group(1).split(",")]
            return np.linspace(args[0], args[1], int(args[2]) if len(args) > 2 else 50).astype(np.float32)
    raise ValueError(f"Unsupported betas spec: {value!r}")


class BFTQBatch(NamedTuple):
    state: jnp.ndarray       # [N, D]
    action: jnp.ndarray      # [N]
    reward: jnp.ndarray      # [N]
    next_state: jnp.ndarray  # [N, D]
    terminal: jnp.ndarray    # [N]
    cost: jnp.ndarray        # [N]
    beta: jnp.ndarray        # [N]


class BudgetedFittedQ:
    def __init__(self, value_network, config, writer=None):
        self.config = config
        self.betas_for_duplication = parse_betas(config["betas_for_duplication"])
        self.betas_for_discretisation = jnp.asarray(parse_betas(config["betas_for_discretisation"]))
        self.loss_function = loss_function_factory(config["loss_function"])
        self.loss_function_c = loss_function_factory(config["loss_function_c"])
        self.network = value_network
        self.n_actions = value_network.n_actions
        self.size_state = value_network.size_state
        self.writer = writer
        self.key = jax.random.PRNGKey(0)
        self.transitions: list = []
        self.batch = 0
        self.epoch = 0
        self.params = None
        self.opt_state = None
        self.optimizer = None
        self._build()
        self.reset()

    # ------------------------------------------------------------------
    def _build(self):
        gamma, gamma_c = self.config["gamma"], self.config["gamma_c"]
        clamp_qc = self.config.get("clamp_qc")
        w_r, w_c = self.config["weights_losses"]
        apply_fn = self.network.apply
        n_actions = self.n_actions
        loss_r, loss_c = self.loss_function, self.loss_function_c

        @jax.jit
        def compute_targets(params, batch: BFTQBatch, betas_disc, bootstrap):
            """Budgeted Bellman Optimality targets (bftq.py:129-188)."""
            S, D = batch.next_state.shape
            B = betas_disc.shape[0]
            ss = jnp.repeat(batch.next_state, B, axis=0)
            bb = jnp.tile(betas_disc, S)[:, None]
            q = apply_fn(params, jnp.concatenate([ss, bb], axis=1)).reshape(S, B, 2 * n_actions)
            mix = batch_mixtures(q, betas_disc, batch.beta)
            next_r = (1 - mix.probability_sup) * mix.qr_inf + mix.probability_sup * mix.qr_sup
            next_c = (1 - mix.probability_sup) * mix.qc_inf + mix.probability_sup * mix.qc_sup
            live = (~batch.terminal) & bootstrap
            next_r = jnp.where(live, next_r, 0.0)
            next_c = jnp.where(live, next_c, 0.0)
            target_r = batch.reward + gamma * next_r
            target_c = batch.cost + gamma_c * next_c
            if clamp_qc is not None:
                target_c = jnp.clip(target_c, clamp_qc[0], clamp_qc[1])
            return target_r, target_c

        def compute_loss(params, sb, actions, target_r, target_c):
            from rl_agents_tpu.ops.onehot import select_action_values

            values = apply_fn(params, sb)
            qr = select_action_values(values[:, :n_actions], actions)
            qc = select_action_values(values[:, n_actions:], actions)
            return w_r * loss_r(qr, target_r) + w_c * loss_c(qc, target_c)

        def make_fit(optimizer, regression_epochs):
            @jax.jit
            def fit(params, opt_state, sb, actions, target_r, target_c):
                def step(carry, _):
                    params, opt_state = carry
                    loss, grads = jax.value_and_grad(compute_loss)(
                        params, sb, actions, target_r, target_c)
                    grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
                    updates, opt_state = optimizer.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                    return (params, opt_state), loss

                (params, opt_state), losses = jax.lax.scan(
                    step, (params, opt_state), None, length=regression_epochs)
                return params, opt_state, losses

            return fit

        self._compute_targets = compute_targets
        self._compute_loss = jax.jit(compute_loss)
        self._make_fit = make_fit
        self._fit_fn = None

    # ------------------------------------------------------------------
    def push(self, state, action, reward, next_state, terminal, cost, beta=None):
        """Store with beta-duplication augmentation (bftq.py:53-74)."""
        state = np.asarray(state, np.float32).reshape(-1)
        next_state = np.asarray(next_state, np.float32).reshape(-1)
        if np.size(self.betas_for_duplication):
            for beta_d in self.betas_for_duplication:
                b = beta_d * beta if beta else beta_d
                self.transitions.append((state, action, reward, next_state, terminal, cost, b))
        else:
            self.transitions.append((state, action, reward, next_state, terminal, cost, beta))

    def _zip_batch(self) -> BFTQBatch:
        t = self.transitions
        return BFTQBatch(
            state=jnp.asarray(np.stack([x[0] for x in t])),
            action=jnp.asarray(np.array([x[1] for x in t], np.int32)),
            reward=jnp.asarray(np.array([x[2] for x in t], np.float32)),
            next_state=jnp.asarray(np.stack([x[3] for x in t])),
            terminal=jnp.asarray(np.array([x[4] for x in t], bool)),
            cost=jnp.asarray(np.array([x[5] for x in t], np.float32)),
            beta=jnp.asarray(np.array([x[6] for x in t], np.float32)),
        )

    def run(self):
        """Fit (Qr, Qc) on the stored batch (bftq.py:76-101)."""
        self.batch += 1
        batch = self._zip_batch()
        sb = jnp.concatenate([batch.state, batch.beta[:, None]], axis=1)
        for self.epoch in range(self.config["epochs"]):
            target_r, target_c = self._compute_targets(
                self.params, batch, self.betas_for_discretisation,
                jnp.asarray(self.epoch > 0))
            delta = float(self._compute_loss(self.params, sb, batch.action, target_r, target_c))
            if self.config["reset_network_each_epoch"]:
                self.reset_network()
            self.params, self.opt_state, losses = self._fit_fn(
                self.params, self.opt_state, sb, batch.action, target_r, target_c)
            if self.writer:
                self.writer.add_scalar("agent/bellman_residual", delta, self.epoch)
                self.writer.add_scalar("agent/regression_loss", float(losses[-1]), self.epoch)
            logger.debug("BFTQ epoch %d: residual %.4f final loss %.4f",
                         self.epoch, delta, float(losses[-1]))
        return self.params

    # ------------------------------------------------------------------
    def reset_network(self):
        self.key, sub = jax.random.split(self.key)
        self.params = self.network.init(sub, jnp.zeros((1, self.size_state + 1)))
        self.opt_state = self.optimizer.init(self.params)

    def reset(self, reset_weight: bool = True):
        self.optimizer = optimizer_factory(
            self.config["optimizer"]["type"],
            lr=self.config["optimizer"].get("learning_rate", 1e-3),
            weight_decay=self.config["optimizer"].get("weight_decay", 0.0))
        self._fit_fn = self._make_fit(self.optimizer, self.config["regression_epochs"])
        if reset_weight or self.params is None:
            self.reset_network()
        self.epoch = 0

    @property
    def memory_size(self):
        return len(self.transitions)
