"""Interval-feedback LMI synthesis via the jnp spectral-penalty solver
(reference: control/interval_feedback.py:118-226, solved there with
cvxpy/SCS — not available in this image)."""
import numpy as np
import pytest

from rl_agents_tpu.agents.control import IntervalFeedbackAgent
from rl_agents_tpu.utils.lmi import solve_interval_lmi


def extended_matrices(A0, dA, B):
    """(reference: interval_feedback.py:85-93)"""
    A0, dA, B = np.asarray(A0, float), np.asarray(dA, float), np.asarray(B, float)
    dAp = sum(np.maximum(a, 0) for a in dA)
    dAn = sum(np.maximum(-a, 0) for a in dA)
    p = A0.shape[0]
    zero = np.zeros((p, p))
    cA0 = np.block([[A0, zero], [zero, A0]])
    cA1 = np.block([[zero, -dAn], [zero, dAp]])
    cA2 = np.block([[-dAp, zero], [dAn, zero]])
    cB = np.concatenate((B, B))
    return cA0, cA1, cA2, cB


STABLE = dict(A0=[[-1.0, 1.0], [0.0, -2.0]], dA=[[[0.0, 0.0], [0.0, 0.1]]],
              B=[[0.0], [1.0]])


def test_analysis_lmi_certifies_stable_interval_system():
    cA0, cA1, cA2, cB = extended_matrices(**STABLE)
    sol = solve_interval_lmi(cA0, cA1, cA2, cB, synthesize_control=False)
    assert sol is not None
    # P is a positive diagonal Lyapunov certificate
    assert np.all(np.diag(sol["P"]) > 0)


def test_analysis_lmi_rejects_unstable_interval_system():
    # pure double integrator: the interval-width subsystem is uncontrollable
    # and destabilised by dA, so no certificate exists
    cA0, cA1, cA2, cB = extended_matrices(
        A0=[[0.0, 1.0], [0.0, 0.0]], dA=[[[0.0, 0.0], [0.0, 0.1]]], B=[[0.0], [1.0]])
    sol = solve_interval_lmi(cA0, cA1, cA2, cB, synthesize_control=False,
                             iters=2000)
    assert sol is None


def test_synthesis_lmi_produces_stabilising_gains():
    cA0, cA1, cA2, cB = extended_matrices(**STABLE)
    sol = solve_interval_lmi(cA0, cA1, cA2, cB, synthesize_control=True)
    assert sol is not None
    K0 = sol["K0"]
    assert K0.shape == (1, 4)
    # nominal extended closed loop is Hurwitz
    eig = np.linalg.eigvals(cA0 + cB @ K0)
    assert np.max(np.real(eig)) < 0


def test_interval_feedback_agent_lmi_path():
    """End-to-end: the agent synthesizes via the LMI (primary path, no
    pole-placement fallback) and computes the attraction basin."""
    agent = IntervalFeedbackAgent(None, {
        **{k: v for k, v in STABLE.items()},
        "D": [[0.0], [1.0]],
        "perturbation_bound": 0.1,
    })
    agent.reset()
    assert agent.K0 is not None and agent.S is not None
    assert agent.Xf is not None  # only set when an LMI certificate was found
    obs = {"interval_min": np.array([0.5, 0.0]), "interval_max": np.array([0.6, 0.1]),
           "reference_state": np.zeros(2), "state": np.array([0.55, 0.05])}
    u = agent.act(obs)
    assert np.isfinite(u).all()
