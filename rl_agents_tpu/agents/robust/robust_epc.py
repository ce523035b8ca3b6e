"""Robust Estimation-Prediction-Control.

Rebuild of the reference RobustEPCAgent (robust/robust_epc.py:8-184):

* Estimation — regularised least squares over recorded (x, u, dx) data gives
  a confidence ellipsoid on the dynamics parameter theta (robust_epc.py:87-117)
* Prediction — the ellipsoid becomes a polytope (A0, {dA}) via Gramian
  eigendecomposition (robust_epc.py:119-132); an LPV interval predictor is
  attached to the planning env so rewards are pessimistic
  (robust_epc.py:134-150; highway_env's LPV is replaced by
  rl_agents_tpu.robust.interval)
* Control — a sub-agent (OPD by default) plans on the robustified env.

Attaching the predictor is a pure params update on the functional env —
no env deep copy.
"""
from __future__ import annotations

import itertools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.base import AbstractAgent
from rl_agents_tpu.envs.base import EnvHandle
from rl_agents_tpu.factory import load_agent

logger = logging.getLogger(__name__)


class RobustEPCAgent(AbstractAgent):
    def __init__(self, env, config=None):
        super().__init__(config)
        self.A = np.array(self.config["A"], dtype=float)
        self.B = np.array(self.config["B"], dtype=float)
        self.phi = np.array(self.config["phi"], dtype=float)
        self.env = env
        self.data = []
        self.robust_env = None
        self.sub_agent = load_agent(self.config.get("sub_agent")
                                    or self.config["sub_agent_path"], env)
        self.ellipsoids = [self.ellipsoid()]

    @classmethod
    def default_config(cls):
        return {
            "gamma": 0.9,
            "delta": 0.9,
            "lambda": 1e-6,
            "sigma": [[1]],
            "A": [[1]],
            "B": [[1]],
            "D": [[1]],
            "omega": [[0], [0]],
            "phi": [[[1]]],
            "parameter_bound": 1,
            "parameter_box": [[0], [1]],
            "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 40,
                          "gamma": 0.9},
            "sub_agent_path": "",
        }

    # ------------------------------------------------------------------
    # Estimation (reference: robust_epc.py:44-117)
    # ------------------------------------------------------------------
    def record(self, observation, action, reward, next_observation, done, info):
        if hasattr(self.env, "functional") and hasattr(self.env.functional, "action_to_control"):
            control = np.asarray(self.env.functional.action_to_control(jnp.asarray(action)))
        else:
            control = np.array([action], dtype=float)
        state = np.asarray(next_observation["state"], dtype=float)
        derivative = np.asarray(next_observation["derivative"], dtype=float)
        self.record_transition(state, derivative, control)

    def record_transition(self, state, derivative, control):
        self.data.append((state.reshape(-1, 1), control.reshape(-1, 1),
                          derivative.reshape(-1, 1)))
        self.ellipsoids.append(self.ellipsoid())

    def ellipsoid(self):
        """Sub-Gaussian confidence ellipsoid on theta (robust_epc.py:87-117)."""
        d = self.phi.shape[0]
        lambda_ = self.config["lambda"]
        if not self.data:
            g_n_lambda = lambda_ * np.identity(d)
            theta_n_lambda = np.zeros(d)
        else:
            phi = np.array([np.squeeze(self.phi @ state, axis=2).transpose()
                            for state, _, _ in self.data])
            dx = np.array([derivative for _, _, derivative in self.data])
            ax = np.array([self.A @ state for state, _, _ in self.data])
            bu = np.array([self.B @ control for _, control, _ in self.data])
            y = dx - ax - bu
            sigma_inv = np.linalg.inv(np.array(self.config["sigma"], dtype=float))
            g_n = np.sum([p.T @ sigma_inv @ p for p in phi], axis=0)
            g_n_lambda = g_n + lambda_ * np.identity(d)
            theta_n_lambda = (np.linalg.inv(g_n_lambda) @ np.sum(
                [phi[n].T @ sigma_inv @ y[n] for n in range(y.shape[0])], axis=0)
            ).squeeze(axis=1)
            theta_n_lambda = theta_n_lambda.clip(0, 1)
        beta_n = np.sqrt(2 * np.log(
            np.sqrt(np.linalg.det(g_n_lambda) / lambda_ ** d) / self.config["delta"])) \
            + np.sqrt(lambda_ * d) * self.config["parameter_bound"]
        return theta_n_lambda, g_n_lambda, beta_n

    # ------------------------------------------------------------------
    # Prediction (reference: robust_epc.py:119-150)
    # ------------------------------------------------------------------
    def polytope(self):
        theta_n_lambda, g_n_lambda, beta_n = self.ellipsoids[-1]
        d = g_n_lambda.shape[0]
        values, p = np.linalg.eig(g_n_lambda)
        m = beta_n * np.linalg.inv(p) @ np.diag(np.sqrt(1 / values))
        h = np.array(list(itertools.product([-1, 1], repeat=d)))
        d_theta_k = np.clip([m @ h_k for h_k in h],
                            -self.config["parameter_bound"], self.config["parameter_bound"])
        a0 = self.A + np.tensordot(theta_n_lambda, self.phi, axes=[0, 0])
        da = [np.tensordot(d_theta, self.phi, axes=[0, 0]) for d_theta in d_theta_k]
        return a0, da

    def robustify_env(self) -> EnvHandle:
        """Attach the interval predictor: swap in the robust functional env
        variant and write the polytope into its params."""
        a0, da = self.polytope()
        da = np.real(np.array(da))
        robust_env = self.env.fork()
        functional = self.env.functional.robust_variant(n_vertices=len(da))
        robust_env.functional = functional
        robust_env._jit_step = jax.jit(functional.step)
        robust_env._jit_reset = jax.jit(functional.reset)
        omega = np.array(self.config["omega"], dtype=float).reshape(2, -1)
        robust_env.params = robust_env.params._replace(
            lpv_a0=jnp.asarray(np.real(a0), jnp.float32),
            lpv_da=jnp.asarray(da, jnp.float32),
            omega_lo=jnp.asarray(np.minimum(omega[0], omega[1]), jnp.float32),
            omega_hi=jnp.asarray(np.maximum(omega[0], omega[1]), jnp.float32))
        return robust_env

    # ------------------------------------------------------------------
    # Control
    # ------------------------------------------------------------------
    def plan(self, observation):
        self.robust_env = self.robustify_env()
        self.sub_agent.env = self.robust_env
        return self.sub_agent.plan(observation)

    def act(self, state):
        return self.plan(state)[0]

    def get_plan(self):
        return self.sub_agent.previous_actions

    def reset(self):
        self.data = []
        self.ellipsoids = [self.ellipsoid()]
        return self.sub_agent.reset()

    def seed(self, seed=None):
        return self.sub_agent.seed(seed)

    def save(self, filename):
        return False

    def load(self, filename):
        return False


class NominalEPCAgent(RobustEPCAgent):
    """No model uncertainty in prediction (reference: robust_epc.py:173-184)."""

    def __init__(self, env, config=None):
        super().__init__(env, config)
        self.config["omega"] = np.zeros(np.shape(self.config["omega"])).tolist()

    def polytope(self):
        a0, da = super().polytope()
        da = [np.zeros(a0.shape)]
        return a0, da
