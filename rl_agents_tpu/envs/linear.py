"""Linear parametric-uncertainty control environment (obstacle-env analog).

The reference's EPC agents run on obstacle_env/highway_env plants exposing
state+derivative observations and an attachable LPV interval predictor that
makes rewards pessimistic (robust_epc.py:44-76, 134-150). This functional env
provides the same surface:

    dx/dt = A x + (phi x) theta + B u + D omega,   omega ~ bounded noise

* obs = {"state", "derivative", "interval_min", "interval_max",
  "reference_state"} dicts
* discrete actions map to bang-bang controls via ``action_to_control``
* the uncertainty polytope (A0, dA) lives in the *params* pytree — attaching
  a predictor (the reference's robustify_env deepcopy, robust_epc.py:134-150)
  is a pure params update; with ``robust=True`` rewards become the worst case
  over the predicted state interval
* reward = max(0, 1 - x0^2) in [0, 1]; |x0| > x_limit emits info["constraint"]
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut
from rl_agents_tpu.robust.interval import LPV, lpv_step


class LinearParams(NamedTuple):
    A: Any            # [p, p]
    B: Any            # [p, q]
    D: Any            # [p, r]
    phi: Any          # [d, p, p]
    theta: Any        # [d] true parameter
    omega_bound: Any  # [] noise bound
    dt: Any
    # uncertainty polytope for interval prediction (used when env.robust)
    lpv_a0: Any       # [p, p]
    lpv_da: Any       # [K, p, p]
    lpv_k: Any        # [q, p] stabilizing feedback
    omega_lo: Any     # [r]
    omega_hi: Any     # [r]


class LinearState(NamedTuple):
    x: Any    # [p]
    dx: Any   # [p]
    x_lo: Any  # [p] predictor interval
    x_hi: Any
    t: Any


class LinearSystemEnv(FunctionalEnv):
    def __init__(self, p: int = 2, q: int = 1, n_vertices: int = 2,
                 max_episode_steps: int = 100, x_limit: float = 2.0,
                 robust: bool = False):
        self.p, self.q = p, q
        self.n_vertices = n_vertices
        self.max_episode_steps = max_episode_steps
        self.x_limit = x_limit
        self.robust = robust
        self.spec = EnvSpec("linear-system", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(2)

    @property
    def observation_space(self):
        return Box(-np.inf, np.inf, (self.p,))

    def default_params(self) -> LinearParams:
        # double integrator with uncertain damping: theta scales -x1
        p, q = self.p, self.q
        A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
        phi = jnp.array([[[0.0, 0.0], [0.0, -1.0]]])
        return LinearParams(
            A=A, B=jnp.array([[0.0], [1.0]]), D=jnp.array([[0.0], [1.0]]),
            phi=phi, theta=jnp.array([0.5]), omega_bound=jnp.float32(0.0),
            dt=jnp.float32(0.1),
            lpv_a0=jnp.zeros((p, p)), lpv_da=jnp.zeros((self.n_vertices, p, p)),
            lpv_k=jnp.zeros((q, p)), omega_lo=jnp.zeros(1), omega_hi=jnp.zeros(1))

    def action_to_control(self, action):
        return jnp.atleast_1d(2.0 * action - 1.0)

    def dynamics_matrix(self, params: LinearParams):
        return params.A + jnp.tensordot(params.theta, params.phi, axes=[0, 0])

    def reset(self, params, key):
        x0 = jnp.zeros(self.p).at[0].set(-1.0)
        state = LinearState(x=x0, dx=jnp.zeros(self.p), x_lo=x0, x_hi=x0,
                            t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def observe(self, params, state: LinearState):
        return {"state": state.x, "derivative": state.dx,
                "interval_min": state.x_lo, "interval_max": state.x_hi,
                "reference_state": jnp.zeros_like(state.x)}

    def base_reward(self, x):
        return jnp.clip(1.0 - x[0] ** 2, 0.0, 1.0)

    def _lpv(self, params: LinearParams, state: LinearState) -> LPV:
        return LPV(a0=params.lpv_a0, da=params.lpv_da, b=params.B, d=params.D,
                   omega_lo=params.omega_lo, omega_hi=params.omega_hi,
                   k=params.lpv_k, x_lo=state.x_lo, x_hi=state.x_hi)

    def step(self, params: LinearParams, state: LinearState, action, key) -> StepOut:
        u = self.action_to_control(action)
        a_true = self.dynamics_matrix(params)
        omega = params.omega_bound * jax.random.uniform(key, (params.D.shape[1],),
                                                        minval=-1.0, maxval=1.0)
        dx = a_true @ state.x + params.B @ u + params.D @ omega
        x = state.x + params.dt * dx
        t = state.t + 1
        if self.robust:
            lpv = lpv_step(self._lpv(params, state), u, params.dt)
            new_state = LinearState(x=x, dx=dx, x_lo=lpv.x_lo, x_hi=lpv.x_hi, t=t)
            corners = jnp.stack([lpv.x_lo, lpv.x_hi])
            reward = jnp.min(jax.vmap(self.base_reward)(corners))
            violated = jnp.maximum(jnp.abs(lpv.x_lo[0]), jnp.abs(lpv.x_hi[0])) > self.x_limit
        else:
            new_state = LinearState(x=x, dx=dx, x_lo=x, x_hi=x, t=t)
            reward = self.base_reward(x)
            violated = jnp.abs(x[0]) > self.x_limit
        info = {"constraint": violated.astype(jnp.float32),
                "cost": violated.astype(jnp.float32)}
        return StepOut(new_state, self.observe(params, new_state), reward,
                       jnp.zeros((), bool), t >= self.max_episode_steps, info)

    def robust_variant(self, n_vertices: int) -> "LinearSystemEnv":
        return LinearSystemEnv(self.p, self.q, n_vertices, self.max_episode_steps,
                               self.x_limit, robust=True)


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = LinearSystemEnv(max_episode_steps=config.get("max_episode_steps", 100),
                          x_limit=config.get("x_limit", 2.0))
    params = env.default_params()
    if "theta" in config:
        params = params._replace(theta=jnp.asarray(config["theta"], jnp.float32))
    if "omega_bound" in config:
        params = params._replace(omega_bound=jnp.float32(config["omega_bound"]))
    return EnvHandle(env, params, config)


class LaneKeepingEnv(LinearSystemEnv):
    """Lateral lane-keeping surrogate (highway-env lane-keeping-v0;
    reference: scripts/configs/LaneKeepingEnv/env.json): 4-state lateral
    bicycle dynamics x = [y, psi, vy, r] under CONTINUOUS steering — the
    substrate of the LinearFeedback / ConstrainedEPC study. Controls pass
    through unclipped-to-bang-bang (``discrete: false`` feedback agents emit
    raw u); reward penalizes lateral deviation."""

    @property
    def action_space(self):
        return Box(-1.0, 1.0, (self.q,))

    def action_to_control(self, action):
        return jnp.clip(jnp.ravel(jnp.atleast_1d(action)).astype(jnp.float32)[:self.q],
                        -1.0, 1.0)

    def default_params(self) -> LinearParams:
        # constant-speed (v=10 m/s) linearized lateral dynamics with an
        # uncertain cornering-stiffness scale theta on the velocity states
        p, q = self.p, self.q
        v = 10.0
        # y' = v psi + vy (heading error drifts the car laterally);
        # psi' = r; vy/r rows from the linearized tire forces
        A = jnp.array([[0.0, v, 1.0, 0.0],
                       [0.0, 0.0, 0.0, 1.0],
                       [0.0, 0.0, -4.0, -v],
                       [0.0, 0.0, -1.0, -3.0]])
        phi = jnp.array([[[0.0, 0.0, 0.0, 0.0],
                          [0.0, 0.0, 0.0, 0.0],
                          [0.0, 0.0, -1.0, 0.0],
                          [0.0, 0.0, 0.0, -1.0]]])
        B = jnp.array([[0.0], [0.0], [8.0], [4.0]])
        D = jnp.array([[0.0], [0.0], [1.0], [1.0]])
        return LinearParams(
            A=A, B=B, D=D, phi=phi, theta=jnp.array([0.5]),
            omega_bound=jnp.float32(0.0), dt=jnp.float32(0.05),
            lpv_a0=jnp.zeros((p, p)), lpv_da=jnp.zeros((self.n_vertices, p, p)),
            lpv_k=jnp.zeros((q, p)), omega_lo=jnp.zeros(1), omega_hi=jnp.zeros(1))

    def reset(self, params, key):
        x0 = jnp.zeros(self.p).at[0].set(0.5)  # 0.5 m lateral offset
        state = LinearState(x=x0, dx=jnp.zeros(self.p), x_lo=x0, x_hi=x0,
                            t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)


def make_lane_keeping(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = LaneKeepingEnv(p=4, q=1,
                         max_episode_steps=config.get("max_episode_steps", 200),
                         x_limit=config.get("x_limit", 4.0))
    return EnvHandle(env, env.default_params(), config)
