"""Interval prediction for linear systems with polytopic uncertainty.

The reference delegates interval propagation to highway_env.interval.LPV
(robust_epc.py:144-150); this module is a self-contained jnp implementation of
the standard interval predictor for

    dx/dt = A(theta) x + B u + D omega,   A(theta) in {A0 + sum_k alpha_k dA_k}

using positive/negative part decomposition (Efimov-style interval observer):
with [A_lo, A_hi] the elementwise interval of A(theta) over alpha in [0,1]^K,

    dxl = Al+ xl+ - Ah+ xl- - Al- xh+ + Ah- xh- + B u + D wl
    dxh = Ah+ xh+ - Al+ xh- - Ah- xl+ + Al- xl- + B u + D wh

which guarantees xl <= x <= xh for all admissible theta and omega. Euler
integration; fully jit/vmap-able so planners can propagate interval states
for entire trees in one program.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.utils.math import neg, pos


class LPV(NamedTuple):
    """Polytopic linear parameter-varying system with interval state."""

    a0: Any        # [p, p] nominal dynamics
    da: Any        # [K, p, p] uncertainty vertices (alpha_k in [0, 1])
    b: Any         # [p, q] control matrix
    d: Any         # [p, r] perturbation matrix
    omega_lo: Any  # [r] perturbation lower bound
    omega_hi: Any  # [r] perturbation upper bound
    k: Any         # [q, p] optional stabilizing feedback (zeros if unused)
    x_lo: Any      # [p] interval lower state
    x_hi: Any      # [p] interval upper state


def make_lpv(a0, da, x0, b=None, d=None, omega=None, k=None) -> LPV:
    a0 = jnp.asarray(a0, jnp.float32)
    p = a0.shape[0]
    da = jnp.asarray(da, jnp.float32).reshape(-1, p, p)
    b = jnp.asarray(b, jnp.float32) if b is not None else jnp.zeros((p, 1))
    d = jnp.asarray(d, jnp.float32) if d is not None else jnp.zeros((p, 1))
    if omega is None:
        omega_lo = omega_hi = jnp.zeros(d.shape[1])
    else:
        omega = jnp.asarray(omega, jnp.float32).reshape(2, -1)
        omega_lo, omega_hi = -jnp.abs(omega[0]), jnp.abs(omega[1])
        # reference convention: omega_i rows bound the perturbation interval
        omega_lo = jnp.minimum(omega[0], omega[1])
        omega_hi = jnp.maximum(omega[0], omega[1])
    k = jnp.asarray(k, jnp.float32) if k is not None else jnp.zeros((b.shape[1], p))
    x0 = jnp.asarray(x0, jnp.float32).reshape(-1)
    return LPV(a0=a0, da=da, b=b, d=d, omega_lo=omega_lo, omega_hi=omega_hi,
               k=k, x_lo=x0, x_hi=x0)


def interval_matrices(lpv: LPV):
    """Elementwise interval [A_lo, A_hi] of A0 + sum_k alpha_k dA_k + B k."""
    a_nom = lpv.a0 + lpv.b @ lpv.k
    a_lo = a_nom + jnp.sum(jnp.minimum(lpv.da, 0.0), axis=0)
    a_hi = a_nom + jnp.sum(jnp.maximum(lpv.da, 0.0), axis=0)
    return a_lo, a_hi


@jax.jit
def lpv_step(lpv: LPV, control, dt) -> LPV:
    """One Euler step of the interval predictor."""
    a_lo, a_hi = interval_matrices(lpv)
    xl, xh = lpv.x_lo, lpv.x_hi
    bu = lpv.b @ jnp.atleast_1d(control)
    dxl = (pos(a_lo) @ pos(xl) - pos(a_hi) @ neg(xl)
           - neg(a_lo) @ pos(xh) + neg(a_hi) @ neg(xh)
           + bu + pos(lpv.d) @ lpv.omega_lo - neg(lpv.d) @ lpv.omega_hi)
    dxh = (pos(a_hi) @ pos(xh) - pos(a_lo) @ neg(xh)
           - neg(a_hi) @ pos(xl) + neg(a_lo) @ neg(xl)
           + bu + pos(lpv.d) @ lpv.omega_hi - neg(lpv.d) @ lpv.omega_lo)
    return lpv._replace(x_lo=xl + dt * dxl, x_hi=xh + dt * dxh)


def lpv_trajectory(lpv: LPV, controls, dt):
    """Scan the predictor over a control sequence; returns stacked intervals."""

    def body(lpv, u):
        lpv = lpv_step(lpv, u, dt)
        return lpv, (lpv.x_lo, lpv.x_hi)

    _, (lo, hi) = jax.lax.scan(body, lpv, controls)
    return lo, hi
