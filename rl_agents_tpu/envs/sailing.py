"""Functional Sailing environment (sailing_env surrogate).

The reference's SailingEnv configs (scripts/configs/SailingEnv/*.json:
``sailing-v0``/``sailing-5/10/20-v0`` from the external ``sailing_env``
package) run the planner comparison study (OPD, UCT, OLOP family, GBOP,
MDP-GapE, BRUE, VI) on the classic stochastic-shortest-path sailing domain
(Vanderbei's "sailing strategies" MDP, the UCT paper's benchmark): a boat on
an S x S grid tacks toward the far corner under a randomly drifting wind;
moving against the wind costs more.

Surrogate semantics (pure jnp):

* state: position (2,) + wind direction (one of 8);
* actions: the 8 compass moves;
* cost per move: 1 + tack penalty by the angle between heading and wind
  (0 away, up to ``upwind_cost`` dead upwind; diagonal moves cost x sqrt(2));
  reward = -cost / worst_cost, in [-1, 0), with +1 on reaching the goal —
  a discounted-return-friendly normalization of the study's cost objective;
* wind drifts each step: stays with prob ~1/2, else rotates one step either
  way (the classic transition kernel).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut

# 8 compass directions, clockwise from east
_MOVES = jnp.array([[1, 0], [1, 1], [0, 1], [-1, 1],
                    [-1, 0], [-1, -1], [0, -1], [1, -1]], jnp.int32)
_DIAG = jnp.array([1.0, np.sqrt(2.0), 1.0, np.sqrt(2.0),
                   1.0, np.sqrt(2.0), 1.0, np.sqrt(2.0)])


class SailingState(NamedTuple):
    pos: Any   # (2,) i32
    wind: Any  # [] i32 in [0, 8)
    t: Any


class SailingEnv(FunctionalEnv):
    def __init__(self, size: int = 10, max_episode_steps: int = 200,
                 upwind_cost: float = 3.0, wind_stability: float = 0.5):
        self.size = size
        self.max_episode_steps = max_episode_steps
        self.upwind_cost = upwind_cost
        self.wind_stability = wind_stability
        self.spec = EnvSpec("sailing", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(8)

    @property
    def observation_space(self):
        return Box(0.0, 1.0, (2 + 8,))

    def default_params(self):
        # tack cost by angular distance heading<->wind in [0, 4]
        angle_cost = 1.0 + jnp.arange(5) / 4.0 * (self.upwind_cost - 1.0)
        return {"angle_cost": angle_cost,
                "stability": jnp.float32(self.wind_stability)}

    def reset(self, params, key):
        state = SailingState(pos=jnp.zeros((2,), jnp.int32),
                             wind=jax.random.randint(key, (), 0, 8),
                             t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def observe(self, params, state: SailingState):
        return jnp.concatenate([
            state.pos.astype(jnp.float32) / self.size,
            (state.wind == jnp.arange(8)).astype(jnp.float32),
        ])

    def step(self, params, state: SailingState, action, key) -> StepOut:
        move = jnp.sum(jnp.where((jnp.arange(8) == action)[:, None], _MOVES, 0), axis=0)
        pos = jnp.clip(state.pos + move, 0, self.size - 1)
        # angular distance between heading and the direction the wind blows to
        delta = jnp.abs((action - state.wind + 4) % 8 - 4)
        cost = jnp.sum(jnp.where(jnp.arange(5) == delta, params["angle_cost"], 0.0)) \
            * jnp.sum(jnp.where(jnp.arange(8) == action, _DIAG, 0.0))
        worst = params["angle_cost"][4] * float(np.sqrt(2.0))

        kw, _ = jax.random.split(key)
        u = jax.random.uniform(kw)
        stay = u < params["stability"]
        left = u < params["stability"] + (1.0 - params["stability"]) / 2.0
        wind = jnp.where(stay, state.wind,
                         (state.wind + jnp.where(left, -1, 1)) % 8)

        goal = jnp.array([self.size - 1, self.size - 1], jnp.int32)
        arrived = jnp.all(pos == goal)
        reward = jnp.where(arrived, 1.0, -cost / worst)
        t = state.t + 1
        new_state = SailingState(pos=pos, wind=wind, t=t)
        return StepOut(new_state, self.observe(params, new_state), reward,
                       arrived, t >= self.max_episode_steps, {"cost": cost})


class SailingMDPAccessor:
    """Exact finite-MDP view of the sailing domain for the Value Iteration
    agent and the planner-study oracle (states = S^2 positions x 8 winds,
    sparse transitions over the 3 wind outcomes). Duck-types the reference's
    ``env.mdp`` contract (value_iteration.py:14) like the FiniteMDP env's
    accessor."""

    mode = "sparse"

    def __init__(self, env: SailingEnv, params, handle):
        S = env.size
        self._S, self._handle = S, handle
        N, A, K = S * S * 8, 8, 3
        x = np.arange(N) // (S * 8)
        y = (np.arange(N) // 8) % S
        w = np.arange(N) % 8
        moves = np.asarray(_MOVES)
        nx = np.clip(x[:, None] + moves[None, :, 0], 0, S - 1)     # [N, A]
        ny = np.clip(y[:, None] + moves[None, :, 1], 0, S - 1)
        angle_cost = np.asarray(params["angle_cost"])
        delta = np.abs((np.arange(A)[None, :] - w[:, None] + 4) % 8 - 4)
        cost = angle_cost[delta] * np.asarray(_DIAG)[None, :]
        worst = angle_cost[4] * np.sqrt(2.0)
        arrived = (nx == S - 1) & (ny == S - 1)
        self.reward = np.where(arrived, 1.0, -cost / worst).astype(np.float32)
        wind_next = np.stack([(w - 1) % 8, w, (w + 1) % 8], axis=1)  # [N, K]
        self.next = ((nx[:, :, None] * S + ny[:, :, None]) * 8
                     + wind_next[:, None, :]).astype(np.int32)       # [N, A, K]
        stability = float(params["stability"])
        side = (1.0 - stability) / 2.0
        self.transition = np.broadcast_to(
            np.array([side, stability, side], np.float32), (N, A, K)).copy()
        self.terminal = ((x == S - 1) & (y == S - 1))

    @property
    def state(self):
        st = self._handle.state
        pos = np.asarray(st.pos)
        return int((pos[0] * self._S + pos[1]) * 8 + int(st.wind))


def make(config: dict | None = None) -> EnvHandle:
    """Build from a reference SailingEnv config: ``sailing-<S>-v0`` ids carry
    the grid size; ``sailing-v0`` takes it from the ``size`` key."""
    config = dict(config or {})
    env_id = str(config.get("id", "sailing-v0"))
    parts = env_id.split("-")
    size = config.get("size", int(parts[1]) if len(parts) == 3 and
                      parts[1].isdigit() else 10)
    env = SailingEnv(size=size,
                     max_episode_steps=config.get("max_episode_steps", 20 * size))
    handle = EnvHandle(env, env.default_params(), config)
    handle.mdp = SailingMDPAccessor(env, handle.params, handle)
    return handle
