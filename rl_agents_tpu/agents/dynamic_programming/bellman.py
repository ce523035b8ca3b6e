"""Bellman-backup kernels: value iteration as jitted fixed points.

TPU-native rebuild of the reference's dynamic programming core
(reference: dynamic_programming/value_iteration.py:37-73 and
robust_value_iteration.py:32-58). The Bellman expectation is the MXU-friendly
part: for stochastic MDPs it is a dense [S,A,S] x [S] contraction; for sparse
MDPs a gather + weighted sum; for deterministic a pure gather. The fixed
point runs as a ``lax.while_loop`` with allclose early-stopping, entirely
on-device, and vmaps over batches of MDPs (model ensembles, benchmark sweeps).
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class BellmanModel(NamedTuple):
    """One finite MDP in any of the three transition encodings."""

    transition: Any  # [S,A] int | [S,A,S] float | [S,A,K] float
    reward: Any      # [S,A]
    terminal: Any    # [S] bool
    next: Any        # [S,A,K] int (sparse only)


def bellman_expectation(model: BellmanModel, value, gamma, mode: str):
    """Q(s,a) = R(s,a) + gamma * E[V(s')], with V zeroed at terminal states
    (reference: value_iteration.py:51-63)."""
    if mode == "deterministic":
        next_v = value[model.transition]
    elif mode == "stochastic":
        next_v = jnp.einsum("sap,p->sa", model.transition, value)
    elif mode == "sparse":
        next_v = jnp.sum(model.transition * value[model.next], axis=-1)
    else:
        raise ValueError(f"Unknown mode {mode}")
    next_v = jnp.where(model.terminal[:, None], 0.0, next_v)
    return model.reward + gamma * next_v


@partial(jax.jit, static_argnames=("mode", "iterations"))
def state_action_value(model: BellmanModel, gamma, mode: str, iterations: int = 100,
                       rtol: float = 1e-5, atol: float = 1e-8):
    """Fixed-point iteration for Q* (reference: value_iteration.py:42-45,65-73).

    Matches the reference's convergence rule: iterate
    ``q <- R + gamma * T max_a q`` at most ``iterations`` times, stopping as
    soon as an update is allclose to its predecessor (and, like the
    reference's break-before-assign, returning the pre-update iterate).
    """
    q0 = jnp.zeros_like(model.reward)

    def operator(q):
        return bellman_expectation(model, jnp.max(q, axis=-1), gamma, mode)

    def cond(carry):
        q, it, converged = carry
        return (~converged) & (it < iterations)

    def body(carry):
        q, it, _ = carry
        q_next = operator(q)
        converged = jnp.allclose(q, q_next, rtol=rtol, atol=atol)
        # keep q when converged (reference breaks before assigning)
        return jnp.where(converged, q, q_next), it + 1, converged

    q, _, _ = jax.lax.while_loop(cond, body, (q0, 0, jnp.asarray(False)))
    return q


@partial(jax.jit, static_argnames=("mode", "iterations"))
def robust_state_action_value(models: BellmanModel, gamma, mode: str, iterations: int = 100,
                              rtol: float = 1e-5, atol: float = 1e-8):
    """Robust Q over a rectangular model set: min over the leading model axis
    of the per-model Bellman expectations, inside the fixed point
    (reference: robust_value_iteration.py:39-48). ``models`` carries a leading
    M axis on transition/reward/terminal."""
    S, A = models.reward.shape[1:3]
    q0 = jnp.zeros((S, A), models.reward.dtype)
    model_axes = BellmanModel(transition=0, reward=0, terminal=0,
                              next=0 if models.next.ndim > 1 else None)
    per_model = jax.vmap(lambda m, v: bellman_expectation(m, v, gamma, mode),
                         in_axes=(model_axes, None))

    def operator(q):
        return jnp.min(per_model(models, jnp.max(q, axis=-1)), axis=0)

    def cond(carry):
        q, it, converged = carry
        return (~converged) & (it < iterations)

    def body(carry):
        q, it, _ = carry
        q_next = operator(q)
        converged = jnp.allclose(q, q_next, rtol=rtol, atol=atol)
        return jnp.where(converged, q, q_next), it + 1, converged

    q, _, _ = jax.lax.while_loop(cond, body, (q0, 0, jnp.asarray(False)))
    return q


@partial(jax.jit, static_argnames=("mode", "horizon"))
def plan_trajectory(model: BellmanModel, q, state, mode: str, horizon: int = 10):
    """Greedy rollout from Q (reference: value_iteration.py:84-96).
    Deterministic-transition models only; returns (states, actions) padded
    with -1 after reaching a terminal state."""

    def body(carry, _):
        s, live = carry
        a = jnp.argmax(q[s])
        if mode == "deterministic":
            s_next = model.transition[s, a]
        else:
            s_next = jnp.argmax(model.transition[s, a])
        terminal = model.terminal[s_next]
        out = (jnp.where(live, s, -1), jnp.where(live, a, -1))
        return (s_next, live & ~terminal), out

    _, (states, actions) = jax.lax.scan(body, (state, jnp.asarray(True)), None, length=horizon)
    return states, actions
