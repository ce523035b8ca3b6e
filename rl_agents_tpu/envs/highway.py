"""Functional highway driving environments (highway-env surrogates).

The reference's flagship benchmarks plan on highway-env's ``highway-v0`` and
``intersection-v0`` (BASELINE configs 4-5; reference configs
scripts/configs/HighwayEnv/*, IntersectionEnv/*). highway-env is a large
pygame-based python simulator; this module provides functional surrogates
with the same observation/action/reward interfaces so planners, DQN and the
attention models run the same workloads as pure jnp programs:

* vehicles: ego + V-1 traffic on L lanes; traffic follows IDM longitudinal
  dynamics and MOBIL lane changes (safety + incentive criteria, politeness
  factor); the ego executes highway-env's discrete meta-actions
  [LANE_LEFT, IDLE, LANE_RIGHT, FASTER, SLOWER]
* observation: Kinematics rows [presence, x, y, vx, vy] (ego first, others
  relative to ego and sorted by distance, normalized) — the exact input
  format of the EgoAttentionNetwork configs
* reward: highway-env's normalized combination of collision penalty,
  high-speed reward and right-lane reward
* intersection variant: two crossing streams; collision when vehicles meet
  inside the conflict zone

Everything is vmappable: thousands of simulations step in lockstep for
planner batches (4096 parallel trees).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from rl_agents_tpu.envs.base import (Box, Discrete, EnvHandle, EnvSpec,
                                     FunctionalEnv, StepOut, TupleSpace)

# meta-actions (highway-env order)
LANE_LEFT, IDLE, LANE_RIGHT, FASTER, SLOWER = 0, 1, 2, 3, 4

LANE_WIDTH = 4.0
VEHICLE_LENGTH = 5.0
MAX_SPEED = 40.0
MIN_SPEED = 0.0


class HighwayParams(NamedTuple):
    dt: Any                 # [] policy step duration
    lanes: Any              # [] i32 (static mirror kept in env)
    target_speeds: Any      # [3] ego cruise speed levels
    idm_t0: Any             # desired time gap
    idm_a: Any              # max acceleration
    idm_b: Any              # comfortable deceleration
    idm_s0: Any             # minimum gap
    speed_reward_range: Any  # [2]
    collision_reward: Any
    right_lane_reward: Any
    high_speed_reward: Any
    obs_scale: Any          # [4] normalization for (x, y, vx, vy)
    mobil_politeness: Any   # MOBIL politeness factor p (highway-env: 0.0)
    mobil_min_gain: Any     # MOBIL acceleration-gain threshold [m/s^2]
    mobil_b_safe: Any       # max braking imposed on the new follower [m/s^2]


class HighwayState(NamedTuple):
    x: Any         # [V] longitudinal positions
    lane: Any      # [V] f32 lateral lane position (continuous for changes)
    target_lane: Any  # [V] i32
    speed: Any     # [V]
    speed_level: Any  # [] i32 ego target-speed index
    alive: Any     # [V] bool
    crashed: Any   # [] bool
    t: Any


class HighwayEnv(FunctionalEnv):
    """Single- or multi-ego highway with configurable action/observation
    types (highway-env surrogate; reference env variant configs:
    scripts/configs/HighwayEnv/env_multi_agent.json, env_continuous.json,
    env_obs_attention.json, TwoWayEnv/env.json).

    All variant knobs are static structure (jit specialization keys):

    * ``controlled_vehicles``: N egos at indices 0..N-1; action is an [N]
      int vector, observation a tuple of N ego-centric kinematics arrays
      (tuple obs drives the DQN multi-agent record/act path).
    * ``action_type``: "meta" (5 discrete meta-actions) or "continuous"
      ([acceleration, steering] in [-1, 1]^2, highway-env ContinuousAction).
    * ``obs_type``: "kinematics" (default), "ttc" (TimeToCollision grid
      [3 speeds, lanes, horizon]) or "occupancy_grid" ([F, H, W] raster).
    * ``obs_features``: 5 = [presence, x, y, vx, vy]; 7 adds cos_h/sin_h
      (the ego_attention_7feat configs).
    """

    def __init__(self, vehicles: int = 15, lanes: int = 4, max_episode_steps: int = 40,
                 policy_dt: float = 1.0, controlled_vehicles: int = 1,
                 action_type: str = "meta", steering_range: tuple = (-0.7853981633974483, 0.7853981633974483),
                 acceleration_range: tuple = (-5.0, 5.0),
                 obs_type: str = "kinematics", obs_features: int = 5,
                 obs_vehicles: int | None = None, ttc_horizon: int = 10,
                 grid_shape: tuple = (11, 11), grid_step: tuple = (5.0, 5.0),
                 lidar_cells: int = 16, lidar_range: float = 64.0):
        if action_type not in ("meta", "continuous"):
            raise ValueError(f"Unknown action_type {action_type}")
        if obs_type not in ("kinematics", "ttc", "occupancy_grid", "lidar"):
            raise ValueError(f"Unknown obs_type {obs_type}")
        if not 1 <= controlled_vehicles <= vehicles:
            raise ValueError("controlled_vehicles must be in [1, vehicles]")
        self.vehicles = vehicles
        self.lanes = lanes
        self.max_episode_steps = max_episode_steps
        self.policy_dt = policy_dt
        self.controlled_vehicles = controlled_vehicles
        self.action_type = action_type
        self.steering_range = tuple(steering_range)
        self.acceleration_range = tuple(acceleration_range)
        self.obs_type = obs_type
        self.obs_features = obs_features
        self.obs_vehicles = obs_vehicles if obs_vehicles is not None else vehicles
        self.ttc_horizon = ttc_horizon
        self.grid_shape = tuple(grid_shape)
        self.grid_step = tuple(grid_step)
        self.lidar_cells = lidar_cells
        self.lidar_range = lidar_range
        self.spec = EnvSpec("highway", max_episode_steps)

    @property
    def action_space(self):
        if self.action_type == "continuous":
            return Box(-1.0, 1.0, (2,))
        if self.controlled_vehicles > 1:
            return TupleSpace((Discrete(5),) * self.controlled_vehicles)
        return Discrete(5)

    def _single_obs_space(self):
        if self.obs_type == "ttc":
            return Box(0.0, 1.0, (3, self.lanes, self.ttc_horizon))
        if self.obs_type == "occupancy_grid":
            return Box(-1.0, 1.0, (self.obs_features,) + self.grid_shape)
        if self.obs_type == "lidar":
            return Box(-1.0, 1.0, (self.lidar_cells, 2))
        return Box(-1.0, 1.0, (min(self.obs_vehicles, self.vehicles), self.obs_features))

    @property
    def observation_space(self):
        if self.controlled_vehicles > 1:
            return TupleSpace((self._single_obs_space(),) * self.controlled_vehicles)
        return self._single_obs_space()

    def default_params(self) -> HighwayParams:
        return HighwayParams(
            dt=jnp.float32(self.policy_dt),
            lanes=jnp.int32(self.lanes),
            target_speeds=jnp.array([20.0, 25.0, 30.0]),
            idm_t0=jnp.float32(1.5), idm_a=jnp.float32(3.0), idm_b=jnp.float32(5.0),
            idm_s0=jnp.float32(10.0),
            speed_reward_range=jnp.array([20.0, 30.0]),
            collision_reward=jnp.float32(-1.0),
            right_lane_reward=jnp.float32(0.1),
            high_speed_reward=jnp.float32(0.4),
            obs_scale=jnp.array([100.0, 100.0, 20.0, 20.0]),
            # highway-env IDMVehicle defaults (behavior.py: POLITENESS=0,
            # LANE_CHANGE_MIN_ACC_GAIN=0.2, LANE_CHANGE_MAX_BRAKING_IMPOSED=2)
            mobil_politeness=jnp.float32(0.0),
            mobil_min_gain=jnp.float32(0.2),
            mobil_b_safe=jnp.float32(2.0),
        )

    # ------------------------------------------------------------------
    def reset(self, params: HighwayParams, key):
        V, L = self.vehicles, self.lanes
        kx, kl, ks = jax.random.split(key, 3)
        # ego at x=0 on a random lane; traffic spread ahead with ~25m spacing
        spacing = 25.0 + 5.0 * jax.random.uniform(kx, (V,))
        x = jnp.cumsum(spacing) - spacing[0]
        lane = jax.random.randint(kl, (V,), 0, L)
        speed = 20.0 + 5.0 * jax.random.uniform(ks, (V,))
        lane = lane.at[0].set(L - 1)
        N = self.controlled_vehicles
        # all egos start at cruise speed; extra egos keep their random lanes
        speed = jnp.where(jnp.arange(V) < N, 25.0, speed)
        level = jnp.int32(1) if N == 1 else jnp.ones((N,), jnp.int32)
        state = HighwayState(
            x=x, lane=lane.astype(jnp.float32), target_lane=lane.astype(jnp.int32),
            speed=speed, speed_level=level,
            alive=jnp.ones((V,), bool), crashed=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    # ------------------------------------------------------------------
    @staticmethod
    def _neighbor_stats(x, speed, own_lane, other_lane, alive, ahead_dir: bool):
        """Per-vehicle closest in-lane neighbor via gather-free masked
        reductions (no indexed gathers: keeps the step lowerable in kernels).

        ``own_lane[i]`` is the (possibly candidate) lane vehicle i is
        evaluated in; other vehicles sit at their actual ``other_lane``.
        Returns (has_neighbor, gap_min, neighbor_speed) with gap measured
        center-to-center along x, toward the leader if ``ahead_dir`` else
        toward the follower.
        """
        same_lane = jnp.abs(other_lane[None, :] - own_lane[:, None]) < 0.5
        # bool arrays never get trailing dims inserted (Mosaic restriction);
        # widen through f32 for the pairwise alive mask
        alive_f = alive.astype(jnp.float32)
        pair_alive = (alive_f[None, :] * alive_f[:, None]) > 0
        if ahead_dir:
            mask = (x[None, :] > x[:, None]) & same_lane & pair_alive
            gap = jnp.where(mask, x[None, :] - x[:, None], jnp.inf)
        else:
            mask = (x[None, :] < x[:, None]) & same_lane & pair_alive
            gap = jnp.where(mask, x[:, None] - x[None, :], jnp.inf)
        gap_min = jnp.min(gap, axis=1)
        has = jnp.isfinite(gap_min)
        near = mask & (gap <= gap_min[:, None])
        count = jnp.maximum(jnp.sum(near, axis=1), 1)
        nb_speed = jnp.sum(jnp.where(near, speed[None, :], 0.0), axis=1) / count
        return has, gap_min, nb_speed

    @staticmethod
    def _idm_from_leader(params, speed, target_speed, has_leader, gap_min,
                         leader_speed):
        """IDM acceleration given precomputed leader stats."""
        d = jnp.minimum(jnp.where(has_leader, gap_min, 1e4) - VEHICLE_LENGTH, 1e4)
        dv = speed - leader_speed
        s_star = params.idm_s0 + speed * params.idm_t0 \
            + speed * dv / (2 * jnp.sqrt(params.idm_a * params.idm_b))
        interaction = jnp.where(has_leader, (jnp.maximum(s_star, 0.0) / jnp.maximum(d, 1.0)) ** 2, 0.0)
        acc = params.idm_a * (1 - (speed / jnp.maximum(target_speed, 1.0)) ** 4 - interaction)
        return jnp.clip(acc, -params.idm_b, params.idm_a)

    def _idm_acceleration(self, params, state: HighwayState, target_speed):
        """IDM longitudinal model: follow the closest leader in-lane."""
        has, gap_min, lead_speed = self._neighbor_stats(
            state.x, state.speed, state.lane, state.lane, state.alive, True)
        return self._idm_from_leader(params, state.speed, target_speed,
                                     has, gap_min, lead_speed)

    def _mobil_target_lanes(self, params, state: HighwayState, target_lane,
                            traffic_target_speed):
        """MOBIL lane-change decision for traffic, fully vectorized
        (highway-env behavior.py IDMVehicle.mobil: safety criterion — the new
        follower's imposed braking stays under ``mobil_b_safe`` — and
        incentive criterion — own IDM gain plus politeness-weighted follower
        gains exceeds ``mobil_min_gain``). Each vehicle's candidate move is
        evaluated independently against the others' current lanes; settled
        vehicles only (a change completes before the next is considered),
        never the ego (its lateral moves are meta-actions).

        Returns (new_target_lane, current-lane IDM acceleration) so the
        caller reuses the leader pass instead of recomputing it.
        """
        V, L = self.vehicles, self.lanes
        x, speed, lane, alive = state.x, state.speed, state.lane, state.alive
        ts = traffic_target_speed

        # current-lane stats: own acc, old follower (who gains when we leave)
        has_l, gap_l, speed_l = self._neighbor_stats(x, speed, lane, lane, alive, True)
        acc_here = self._idm_from_leader(params, speed, ts, has_l, gap_l, speed_l)
        has_f, gap_f, speed_f = self._neighbor_stats(x, speed, lane, lane, alive, False)
        # old follower's acc while following us, and after we leave (it
        # inherits our leader at gap_f + gap_l)
        f_old_acc = self._idm_from_leader(params, speed_f, ts, has_f, gap_f, speed)
        f_after_acc = self._idm_from_leader(params, speed_f, ts, has_f & has_l,
                                            gap_f + gap_l, speed_l)
        old_follower_gain = jnp.where(has_f, f_after_acc - f_old_acc, 0.0)

        def candidate(delta):
            cand = lane + delta
            valid = (cand >= -0.25) & (cand <= L - 0.75)
            nh_l, ng_l, ns_l = self._neighbor_stats(x, speed, cand, lane, alive, True)
            acc_new = self._idm_from_leader(params, speed, ts, nh_l, ng_l, ns_l)
            nh_f, ng_f, ns_f = self._neighbor_stats(x, speed, cand, lane, alive, False)
            # new follower: acc before (following our new leader) and after
            # (following us) the change
            nf_before = self._idm_from_leader(params, ns_f, ts, nh_f & nh_l,
                                              ng_f + ng_l, ns_l)
            nf_after = self._idm_from_leader(params, ns_f, ts, nh_f, ng_f, speed)
            safe = ~nh_f | (nf_after >= -params.mobil_b_safe)
            new_follower_gain = jnp.where(nh_f, nf_after - nf_before, 0.0)
            gain = acc_new - acc_here + params.mobil_politeness * (
                new_follower_gain + old_follower_gain)
            ok = valid & safe & (gain > params.mobil_min_gain)
            return ok, gain

        ok_left, gain_left = candidate(-1.0)
        ok_right, gain_right = candidate(1.0)
        left_wins = ok_left & (~ok_right | (gain_left >= gain_right))
        delta = jnp.where(left_wins, -1, 0) + jnp.where(ok_right & ~left_wins, 1, 0)
        settled = jnp.abs(lane - target_lane.astype(jnp.float32)) < 0.05
        # every controlled vehicle's lateral moves are meta-actions, not MOBIL
        is_traffic = jnp.arange(V) >= self.controlled_vehicles
        change = settled & is_traffic & alive & (delta != 0)
        # Concurrent-mover conflict: every candidate was evaluated against the
        # others' CURRENT lanes, so two simultaneous movers can target the same
        # gap and merge unphysically (highway-env's change_lane_policy runs
        # per-vehicle sequentially, so the second mover would have seen the
        # first). Suppress the REAR mover of any pair entering the same lane
        # inside the rear's desired IDM gap — the rear is the one whose blind
        # safety check would have failed.
        tgt = target_lane + jnp.where(change, delta, 0)
        idx = jnp.arange(V)
        pair = change[:, None] & change[None, :] & (idx[:, None] != idx[None, :])
        same_tgt = pair & (tgt[:, None] == tgt[None, :])
        i_is_rear = (x[None, :] > x[:, None]) | \
            ((x[None, :] == x[:, None]) & (idx[None, :] < idx[:, None]))
        desired_gap = VEHICLE_LENGTH + params.idm_s0 + speed[:, None] * params.idm_t0
        dist = jnp.abs(x[None, :] - x[:, None])
        suppressed = jnp.any(same_tgt & i_is_rear & (dist < desired_gap), axis=1)
        change = change & ~suppressed
        new_target = jnp.clip(target_lane + jnp.where(change, delta, 0), 0, L - 1)
        return new_target, acc_here

    def step(self, params: HighwayParams, state: HighwayState, action, key) -> StepOut:
        out = self.transition(params, state, action, key)
        return out._replace(obs=self.observe(params, out.state))

    transition_uses_key = False  # IDM dynamics are deterministic given actions

    def transition(self, params: HighwayParams, state: HighwayState, action, key) -> StepOut:
        """Dynamics without the (sorted, normalized) observation build —
        the open-loop planning hot path."""
        V, L = self.vehicles, self.lanes
        N = self.controlled_vehicles
        frozen = state.crashed
        is_ego = jnp.arange(V) == 0 if N == 1 else jnp.arange(V) < N
        lane_rate_ego = None

        if self.action_type == "continuous":
            # --- ContinuousAction (highway-env action.py:117-160): action is
            # [acceleration, steering] in [-1,1]^2, mapped into the configured
            # ranges; lateral motion integrates v*sin(steering) directly.
            speed_level = state.speed_level
            a_lo, a_hi = self.acceleration_range
            s_lo, s_hi = self.steering_range
            act = jnp.clip(action, -1.0, 1.0)  # highway-env clips raw commands
            ego_acc = a_lo + (act[0] + 1.0) * 0.5 * (a_hi - a_lo)
            steering = s_lo + (act[1] + 1.0) * 0.5 * (s_hi - s_lo)
            lane_rate_ego = state.speed[0] * jnp.sin(steering) / LANE_WIDTH
            # traffic keeps MOBIL/IDM; ego's target lane tracks its position
            target_lane, idm_acc = self._mobil_target_lanes(
                params, state, state.target_lane, jnp.float32(25.0))
        else:
            # --- ego meta-action(s) -----------------------------------
            # N==1 keeps the scalar action/speed_level contract bit-for-bit;
            # N>1 takes an [N] action vector (MultiAgentAction,
            # reference: HighwayEnv/env_multi_agent.json)
            acts = action if N == 1 else jnp.asarray(action, jnp.int32).reshape(N)
            speed_level = jnp.clip(state.speed_level
                                   + jnp.where(acts == FASTER, 1, 0)
                                   - jnp.where(acts == SLOWER, 1, 0), 0, 2)
            if N == 1:
                lane_delta = jnp.where(acts == LANE_LEFT, -1, 0) \
                    + jnp.where(acts == LANE_RIGHT, 1, 0)
            else:
                acts_v = jnp.concatenate([acts, jnp.full((V - N,), IDLE, jnp.int32)])
                lane_delta = jnp.where(acts_v == LANE_LEFT, -1, 0) \
                    + jnp.where(acts_v == LANE_RIGHT, 1, 0)
            target_lane = jnp.clip(state.target_lane + jnp.where(is_ego, lane_delta, 0),
                                   0, L - 1)
            # traffic MOBIL lane changes (egos excluded inside); reuses the
            # current-lane leader pass for the IDM acceleration below
            target_lane, idm_acc = self._mobil_target_lanes(
                params, state, target_lane, jnp.float32(25.0))

            # egos track their target speed directly (they can rear-end —
            # collision avoidance is the planner's job, as in highway-env's
            # ControlledVehicle)
            levels = jnp.arange(params.target_speeds.shape[0])
            if N == 1:
                ego_target_speed = jnp.sum(jnp.where(levels == speed_level,
                                                     params.target_speeds, 0.0))
                ego_acc = jnp.clip(ego_target_speed - state.speed[0],
                                   -params.idm_b, params.idm_a)
            else:
                per_ego_target = jnp.sum(jnp.where(levels[None, :] == speed_level[:, None],
                                                   params.target_speeds[None, :], 0.0), axis=1)
                target_v = jnp.concatenate([per_ego_target, jnp.zeros((V - N,))])
                ego_acc = jnp.clip(target_v - state.speed, -params.idm_b, params.idm_a)

        # --- longitudinal dynamics: traffic follows IDM ---------------
        acc = jnp.where(is_ego, ego_acc, idm_acc)  # scatter-free (Mosaic has no scatter)
        speed = jnp.clip(state.speed + acc * params.dt, MIN_SPEED, MAX_SPEED)
        x = state.x + speed * params.dt

        # --- lateral dynamics: first-order pull to target lane --------
        lane = state.lane + jnp.clip(target_lane.astype(jnp.float32) - state.lane,
                                     -params.dt, params.dt)
        if lane_rate_ego is not None:
            ego_lane = jnp.clip(state.lane[0] + lane_rate_ego * params.dt, 0.0, L - 1.0)
            lane = jnp.where(jnp.arange(V) == 0, ego_lane, lane)
            target_lane = jnp.where(jnp.arange(V) == 0,
                                    jnp.round(ego_lane).astype(jnp.int32), target_lane)

        # --- collisions ------------------------------------------------
        close_x = jnp.abs(x[None, :] - x[:, None]) < VEHICLE_LENGTH
        close_lane = jnp.abs(lane[None, :] - lane[:, None]) < 0.8
        alive_f2 = state.alive.astype(jnp.float32)
        both_alive = (alive_f2[None, :] * alive_f2[:, None]) > 0
        not_self = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) \
            != jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
        colliding = close_x & close_lane & both_alive & not_self
        if N == 1:
            ego_crash = jnp.any(colliding[0]) | state.crashed
        else:
            per_ego_crash = jnp.any(colliding[:N], axis=1) | state.crashed
            ego_crash = jnp.any(per_ego_crash)

        # arithmetic freeze-blend: a bool scalar broadcast over [V] inserts a
        # minor dim on a sub-32-bit type, which Mosaic cannot lower
        fm = frozen.astype(jnp.float32)
        new_state = HighwayState(
            x=state.x * fm + x * (1 - fm),
            lane=state.lane * fm + lane * (1 - fm),
            target_lane=target_lane,
            speed=state.speed * fm + speed * (1 - fm),
            speed_level=speed_level,
            alive=state.alive,
            crashed=ego_crash,
            t=state.t + 1)

        # --- reward (highway-env normalized combination) --------------
        lo, hi = params.speed_reward_range[0], params.speed_reward_range[1]
        if N == 1:
            scaled_speed = jnp.clip((speed[0] - lo) / (hi - lo), 0.0, 1.0)
            lane_frac = lane[0] / jnp.maximum(L - 1, 1)
            raw = params.collision_reward * ego_crash.astype(jnp.float32) \
                + params.high_speed_reward * scaled_speed \
                + params.right_lane_reward * lane_frac
        else:
            # scalar reward is the mean of the per-ego rewards (highway-env
            # multi-agent: env reward averages _agent_rewards)
            scaled_speed = jnp.clip((speed[:N] - lo) / (hi - lo), 0.0, 1.0)
            lane_frac = lane[:N] / jnp.maximum(L - 1, 1)
            raw = jnp.mean(params.collision_reward * per_ego_crash.astype(jnp.float32)
                           + params.high_speed_reward * scaled_speed
                           + params.right_lane_reward * lane_frac)
        reward = (raw - params.collision_reward) \
            / (params.high_speed_reward + params.right_lane_reward - params.collision_reward)
        reward = jnp.where(frozen, 0.0, jnp.clip(reward, 0.0, 1.0))

        terminated = ego_crash
        truncated = new_state.t >= self.max_episode_steps
        # placeholder obs: zero-size arrays do not lower in Mosaic kernels
        return StepOut(new_state, jnp.zeros((1,)), reward,
                       terminated, truncated, {"crashed": ego_crash,
                                               "speed": speed[0],
                                               "cost": ego_crash.astype(jnp.float32)})

    # ------------------------------------------------------------------
    def observe(self, params: HighwayParams, state: HighwayState):
        if self.controlled_vehicles > 1:
            return tuple(self._observe_single(params, state, e)
                         for e in range(self.controlled_vehicles))
        return self._observe_single(params, state, 0)

    def _observe_single(self, params: HighwayParams, state: HighwayState, ego: int):
        if self.obs_type == "ttc":
            return self._observe_ttc(params, state, ego)
        if self.obs_type == "occupancy_grid":
            return self._observe_grid(params, state, ego)
        if self.obs_type == "lidar":
            return self._observe_lidar(params, state, ego)
        return self._observe_kinematics(params, state, ego)

    def _observe_lidar(self, params: HighwayParams, state: HighwayState, ego: int):
        """LidarObservation (highway-env observation.py LidarObservation;
        reference: ExitEnv/env_lidar.json): ``[cells, 2]`` — per angular
        sector, the normalized distance to the nearest vehicle and its
        closing speed along the ray. Dense one-hot sector binning, no
        scatters."""
        C, R = self.lidar_cells, self.lidar_range
        dx = state.x - state.x[ego]
        dy = (state.lane - state.lane[ego]) * LANE_WIDTH
        dist = jnp.sqrt(dx ** 2 + dy ** 2)
        angle = jnp.arctan2(dy, dx) % (2 * jnp.pi)
        sector = (jnp.floor(angle / (2 * jnp.pi / C)).astype(jnp.int32)) % C
        valid = state.alive & (jnp.arange(self.vehicles) != ego) & (dist <= R)
        hit = valid[None, :] & (sector[None, :] == jnp.arange(C)[:, None])  # [C, V]
        d = jnp.where(hit, dist[None, :], jnp.inf)
        d_min = jnp.min(d, axis=1)
        nearest = hit & (d <= d_min[:, None] + 1e-6)
        count = jnp.maximum(jnp.sum(nearest, axis=1), 1)
        # closing speed along the ray: -(relative velocity . unit ray)
        vx = state.speed - state.speed[ego]
        vy = self._lateral_speed(params, state)
        radial = (vx * dx + vy * dy) / jnp.maximum(dist, 1e-3)
        closing = jnp.sum(jnp.where(nearest, -radial[None, :], 0.0), axis=1) / count
        return jnp.stack([jnp.where(jnp.isfinite(d_min), d_min / R, 1.0),
                          jnp.clip(closing / MAX_SPEED, -1.0, 1.0)], axis=1)

    def _directions(self):
        """Per-vehicle travel direction along x (+1), or None when uniform.
        TwoWayEnv overrides with -1 for the oncoming stream."""
        return None

    def _lateral_speed(self, params, state):
        """Lateral velocity from lane-change progress (the first-order pull
        executed by the next transition), in m/s."""
        return jnp.clip(state.target_lane.astype(jnp.float32) - state.lane,
                        -params.dt, params.dt) * LANE_WIDTH / params.dt

    @staticmethod
    def _sort_permutation(dist):
        """Stable-ascending sort as a one-hot permutation matrix: P[r, i] = 1
        iff vehicle i has rank r. ``P @ cols`` then reorders every feature
        column in ONE exact 0/1 matmul — ``argsort`` + per-lane ``x[order]``
        gathers were the graph planners' dominant device cost (measured
        ~2.4 ms/round at 5120 lanes, see docs/onehot.md)."""
        V = dist.shape[0]
        iota = jnp.arange(V)
        less = (dist[None, :] < dist[:, None]) \
            | ((dist[None, :] == dist[:, None]) & (iota[None, :] < iota[:, None]))
        rank = jnp.sum(less.astype(jnp.int32), axis=1)
        return (rank[None, :] == iota[:, None]).astype(jnp.float32)

    def _observe_kinematics(self, params: HighwayParams, state: HighwayState, ego: int):
        """Kinematics observation: ego-relative, distance-sorted, normalized.
        ``obs_features == 7`` appends cos_h/sin_h heading columns
        (reference: HighwayEnv/env_obs_attention.json feature list)."""
        dx = state.x - state.x[ego]
        dy = (state.lane - state.lane[ego]) * LANE_WIDTH
        vx = state.speed - state.speed[ego]
        if self.obs_features >= 7:
            vy_abs = self._lateral_speed(params, state)
            vy = vy_abs - vy_abs[ego]
        else:
            vy = jnp.zeros_like(vx)
        dist = jnp.abs(dx) + jnp.abs(dy)
        P = self._sort_permutation(dist.at[ego].set(-1.0))  # ego first
        cols = [
            state.alive.astype(jnp.float32),
            jnp.clip(dx / params.obs_scale[0], -1, 1),
            jnp.clip(dy / params.obs_scale[1], -1, 1),
            jnp.clip(vx / params.obs_scale[2], -1, 1),
            jnp.clip(vy / params.obs_scale[3], -1, 1),
        ]
        if self.obs_features >= 7:
            fwd = jnp.maximum(state.speed, 1e-3)
            heading = jnp.arctan2(vy_abs, fwd)
            cols += [jnp.cos(heading), jnp.sin(heading)]
        # masked reduction, not a matmul: exact f32 selection (the default
        # TPU matmul computes f32 dots in bf16 — breaks the 1e-4 obs_key
        # quantization), and at [V, V] x [V, F] sizes the dot form pads each
        # lane's 15x15x7 product onto 128-wide MXU tiles — measured ~2 ms
        # per 20480-lane fan vs fused VPU streams for this form.
        rows = jnp.sum(jnp.where(P[:, :, None] > 0,
                                 jnp.stack(cols, axis=1)[None, :, :], 0.0),
                       axis=1)
        presence = rows[:, 0]
        # ego row carries absolute features like highway-env
        if self.obs_features >= 7:
            ego_row = jnp.stack(
                [1.0, state.x[ego] / 1000.0, 0.0, 0.0, 0.0,
                 jnp.cos(heading)[ego], jnp.sin(heading)[ego]])
        else:
            ego_row = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0]) * jnp.stack(
                [1.0, state.x[ego] / 1000.0,
                 state.lane[ego] / jnp.maximum(self.lanes - 1, 1),
                 state.speed[ego] / MAX_SPEED, 0.0])
        rows = rows.at[0].set(ego_row)
        rows = rows * presence[:, None]
        R = min(self.obs_vehicles, self.vehicles)
        return rows[:R]

    def _observe_ttc(self, params: HighwayParams, state: HighwayState, ego: int):
        """TimeToCollision observation (highway-env observation.py
        TimeToCollisionObservation; reference: TwoWayEnv/env.json): a
        [3 ego-speed-levels, lanes, horizon] occupancy grid — cell
        ``[l, lane, t]`` is 1 when some vehicle ahead in ``lane`` would be
        reached in ``t`` seconds at ego candidate speed ``target_speeds[l]``."""
        L, H = self.lanes, self.ttc_horizon
        direction = self._directions()
        other_vx = state.speed if direction is None else state.speed * direction
        dx = state.x - state.x[ego]
        valid = state.alive & (jnp.arange(self.vehicles) != ego) & (dx > 0)
        lane_idx = jnp.clip(jnp.round(state.lane).astype(jnp.int32), 0, L - 1)
        closing = params.target_speeds[:, None] - other_vx[None, :]
        ttc = dx[None, :] / jnp.maximum(closing, 1e-3)          # [3, V]
        tbin = jnp.floor(ttc).astype(jnp.int32)
        ok = valid[None, :] & (closing > 0) & (tbin >= 0) & (tbin < H)
        # dense one-hot accumulation over (lane, time-bin) — no scatters
        lane_hit = lane_idx[None, :, None] == jnp.arange(L)[None, None, :]   # [1, V, L]
        time_hit = tbin[:, :, None] == jnp.arange(H)[None, None, :]          # [3, V, H]
        cells = (ok[:, :, None, None] & lane_hit[:, :, :, None] & time_hit[:, :, None, :])
        return jnp.clip(jnp.sum(cells.astype(jnp.float32), axis=1), 0.0, 1.0)

    def _observe_grid(self, params: HighwayParams, state: HighwayState, ego: int):
        """OccupancyGrid observation (highway-env observation.py
        OccupancyGridObservation; reference: IntersectionEnv/env_grid.json):
        an [F, H, W] raster of ego-relative kinematics features."""
        Hc, Wc = self.grid_shape
        sy, sx = self.grid_step[1], self.grid_step[0]
        dx = state.x - state.x[ego]
        dy = (state.lane - state.lane[ego]) * LANE_WIDTH
        vx = state.speed - state.speed[ego]
        vy = self._lateral_speed(params, state)
        ix = jnp.floor(dx / sx + Wc / 2.0).astype(jnp.int32)
        iy = jnp.floor(dy / sy + Hc / 2.0).astype(jnp.int32)
        inside = state.alive & (ix >= 0) & (ix < Wc) & (iy >= 0) & (iy < Hc)
        cell = (inside[:, None, None]
                & (iy[:, None, None] == jnp.arange(Hc)[None, :, None])
                & (ix[:, None, None] == jnp.arange(Wc)[None, None, :]))
        feats = [jnp.ones_like(dx),
                 jnp.clip(dx / params.obs_scale[0], -1, 1),
                 jnp.clip(dy / params.obs_scale[1], -1, 1),
                 jnp.clip(vx / params.obs_scale[2], -1, 1),
                 jnp.clip(vy / params.obs_scale[3], -1, 1)]
        if self.obs_features >= 7:
            heading = jnp.arctan2(vy, jnp.maximum(state.speed, 1e-3))
            feats += [jnp.cos(heading), jnp.sin(heading)]
        stack = jnp.stack(feats[:self.obs_features], axis=0)     # [F, V]
        # masked reduction through the 0/1 cell one-hot: exact f32 (the
        # default TPU matmul computes f32 dots in bf16 — breaks obs_key
        # quantization) and fuses on the VPU instead of padding tiny
        # per-lane dots onto MXU tiles
        out = jnp.sum(jnp.where(cell[None, :, :, :],
                                stack[:, :, None, None], 0.0), axis=1)
        return jnp.clip(out, -1.0, 1.0)

    def to_finite_mdp(self, params, state):
        """TTC-grid finite-MDP view (highway-env
        envs/common/finite_mdp.py:finite_mdp): states are (ego speed level,
        lane, time-to-collision position), actions the 5 meta-actions;
        moving into an occupied TTC cell crashes into an absorbing state.
        Powers ValueIterationAgent and the MCTS VI-prior configs
        (reference: HighwayEnv/agents/ValueIterationAgent/baseline.json,
        MCTSWithPriorPolicyAgent/vi_prior.json)."""
        import numpy as np

        L, H = self.lanes, self.ttc_horizon
        V = int(params.target_speeds.shape[0])
        grid = np.asarray(self._observe_ttc(params, state, 0))  # [V, L, H]
        S = V * L * H + 1
        crash = S - 1
        idx = np.arange(S - 1)
        lvl, lane, t = idx // (L * H), (idx // H) % L, idx % H
        # action-conditioned next (speed level, lane); time always advances
        lvl_next = np.stack([lvl, lvl, lvl,
                             np.minimum(lvl + 1, V - 1),
                             np.maximum(lvl - 1, 0)], axis=1)
        lane_next = np.stack([np.maximum(lane - 1, 0), lane,
                              np.minimum(lane + 1, L - 1), lane, lane], axis=1)
        t_next = np.minimum(t + 1, H - 1)[:, None].repeat(5, axis=1)
        collided = grid[lvl_next, lane_next, t_next] > 0
        nxt = (lvl_next * L + lane_next) * H + t_next
        transition = np.where(collided, crash, nxt).astype(np.int32)
        transition = np.concatenate(
            [transition, np.full((1, 5), crash, np.int32)])  # absorbing crash
        hs = float(params.high_speed_reward)
        rl = float(params.right_lane_reward)
        cr = float(params.collision_reward)
        raw = np.where(collided, cr,
                       hs * lvl_next / max(V - 1, 1)
                       + rl * lane_next / max(L - 1, 1))
        reward = ((raw - cr) / (hs + rl - cr)).astype(np.float32)
        reward = np.concatenate([reward, np.zeros((1, 5), np.float32)])
        terminal = np.zeros(S, bool)
        terminal[crash] = True

        ego_level = int(np.asarray(state.speed_level).ravel()[0])
        ego_state = int((ego_level * L + int(round(float(state.lane[0])))) * H)

        class _View:
            mode = "deterministic"
        view = _View()
        view.transition, view.reward, view.terminal = transition, reward, terminal
        view.state = ego_state
        return view

    def preprocess(self, name, args):
        """highway-env planning preprocessors (reference: factory.py:97-116):
        ``simplify`` keeps the ego + closest vehicles, shrinking the planning
        model (highway-env's AbstractEnv.simplify); others are no-ops here."""
        if name == "simplify":
            keep = int(args[0]) if args else min(self.vehicles, 6)
            keep = min(keep, self.vehicles)
            smaller = HighwayEnv(vehicles=keep, lanes=self.lanes,
                                 max_episode_steps=self.max_episode_steps,
                                 policy_dt=self.policy_dt)

            def transform(params, state: HighwayState):
                dist = jnp.abs(state.x - state.x[0]).at[0].set(-1.0)
                order = jnp.argsort(dist)[:keep]
                return params, HighwayState(
                    x=state.x[order], lane=state.lane[order],
                    target_lane=state.target_lane[order],
                    speed=state.speed[order],
                    speed_level=state.speed_level,
                    alive=state.alive[order], crashed=state.crashed, t=state.t)

            return smaller, transform
        if name == "change_vehicles":
            # The robust studies' model-ensemble preprocessor (reference:
            # MergeEnv/agents/DiscreteRobustMCTSAgent/agg_def.json): swap the
            # traffic behavior model. Here behavior is an IDM/MOBIL parameter
            # preset, so the transform rewrites params and keeps the state.
            spec = args if isinstance(args, str) else (args[0] if args else "")
            over = _BEHAVIOR_PRESETS.get(str(spec).rsplit(".", 1)[-1], {})

            def change(params, state):
                if over:
                    params = params._replace(
                        **{k: jnp.float32(v) for k, v in over.items()})
                return params, state

            return self, change
        if name == "set_route_at_intersection":
            return self
        raise ValueError(f"HighwayEnv has no preprocessor {name!r}")


class IntersectionEnv(HighwayEnv):
    """Crossing-streams surrogate of intersection-v0: the ego travels along
    +x; crossing traffic travels along +y through a conflict zone at the
    origin. Meta-actions control ego speed only (highway-env's intersection
    uses 3 speed actions: SLOWER, IDLE, FASTER)."""

    def __init__(self, vehicles: int = 8, max_episode_steps: int = 26,
                 policy_dt: float = 1.0, controlled_vehicles: int = 1,
                 obs_type: str = "kinematics", obs_features: int = 5,
                 obs_vehicles: int | None = None,
                 grid_shape: tuple = (11, 11), grid_step: tuple = (5.0, 5.0)):
        if obs_type not in ("kinematics", "occupancy_grid"):
            raise ValueError(
                f"IntersectionEnv supports kinematics/occupancy_grid, not {obs_type}")
        super().__init__(vehicles=vehicles, lanes=1,
                         max_episode_steps=max_episode_steps, policy_dt=policy_dt,
                         controlled_vehicles=controlled_vehicles,
                         obs_type=obs_type, obs_features=obs_features,
                         obs_vehicles=obs_vehicles, grid_shape=grid_shape,
                         grid_step=grid_step)
        self.spec = EnvSpec("intersection", max_episode_steps)

    @property
    def action_space(self):
        if self.controlled_vehicles > 1:
            return TupleSpace((Discrete(3),) * self.controlled_vehicles)
        return Discrete(3)  # SLOWER, IDLE, FASTER

    def reset(self, params, key):
        V, N = self.vehicles, self.controlled_vehicles
        kx, ks = jax.random.split(key)
        # egos approach in file from x=-60; crossing vehicles from y in [-100, -20]
        ego_x = -60.0 - 15.0 * jnp.arange(N, dtype=jnp.float32)
        x = jnp.concatenate([ego_x,
                             -100.0 + 80.0 * jax.random.uniform(kx, (V - N,))])
        speed = jnp.concatenate([jnp.full((N,), 10.0),
                                 8.0 + 4.0 * jax.random.uniform(ks, (V - N,))])
        level = jnp.int32(1) if N == 1 else jnp.ones((N,), jnp.int32)
        state = HighwayState(
            x=x, lane=jnp.zeros((V,)), target_lane=jnp.zeros((V,), jnp.int32),
            speed=speed, speed_level=level,
            alive=jnp.ones((V,), bool), crashed=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def step(self, params, state: HighwayState, action, key) -> StepOut:
        V, N = self.vehicles, self.controlled_vehicles
        frozen = state.crashed
        acts = action if N == 1 else jnp.asarray(action, jnp.int32).reshape(N)
        speed_level = jnp.clip(state.speed_level
                               + jnp.where(acts == 2, 1, 0)
                               - jnp.where(acts == 0, 1, 0), 0, 2)
        levels = jnp.arange(params.target_speeds.shape[0])
        if N == 1:
            ego_target = jnp.sum(jnp.where(levels == speed_level,
                                           params.target_speeds, 0.0)) * 10.0 / 25.0
        else:  # one-hot, not a per-lane gather (ops/onehot.py discipline)
            ego_target = jnp.sum(jnp.where(levels[None, :] == speed_level[:, None],
                                           params.target_speeds[None, :], 0.0),
                                 axis=1) * 10.0 / 25.0
        is_ego = jnp.arange(V) == 0 if N == 1 else jnp.arange(V) < N
        if N == 1:
            acc = jnp.where(is_ego, 2.0 * (ego_target - state.speed), 0.0)
        else:
            target_v = jnp.concatenate([ego_target, jnp.zeros((V - N,))])
            acc = jnp.where(is_ego, 2.0 * (target_v - state.speed), 0.0)
        speed = jnp.clip(state.speed + acc * params.dt, 0.0, 20.0)
        x = state.x + speed * params.dt

        # conflict: egos on the x-axis, others cross on the y-axis; both near
        # the origin -> crash. Egos can also rear-end each other in file.
        near = jnp.abs(x) < VEHICLE_LENGTH
        crossing_near = jnp.any(near & ~is_ego)
        if N == 1:
            ego_crash = (near[0] & crossing_near) | state.crashed
            any_crash = ego_crash
            arrived = x[0] > 25.0
            scaled_speed = jnp.clip(speed[0] / 10.0, 0.0, 1.0)
            reward = jnp.where(ego_crash, 0.0,
                               jnp.where(arrived, 1.0, 0.5 * scaled_speed))
        else:
            ego_x, ego_v = x[:N], speed[:N]
            rear_end = jnp.any(
                (jnp.abs(ego_x[:, None] - ego_x[None, :]) < VEHICLE_LENGTH)
                & (jnp.arange(N)[:, None] != jnp.arange(N)[None, :]), axis=1)
            per_ego_crash = (near[:N] & crossing_near) | rear_end | state.crashed
            any_crash = jnp.any(per_ego_crash)
            arrived = jnp.all(ego_x > 25.0)
            scaled_speed = jnp.clip(ego_v / 10.0, 0.0, 1.0)
            per_reward = jnp.where(per_ego_crash, 0.0,
                                   jnp.where(ego_x > 25.0, 1.0, 0.5 * scaled_speed))
            ego_crash = any_crash
            reward = jnp.mean(per_reward)

        new_state = HighwayState(
            x=jnp.where(frozen, state.x, x), lane=state.lane,
            target_lane=state.target_lane,
            speed=jnp.where(frozen, state.speed, speed),
            speed_level=speed_level, alive=state.alive, crashed=any_crash,
            t=state.t + 1)

        reward = jnp.where(frozen, 0.0, reward)
        terminated = any_crash | arrived
        truncated = new_state.t >= self.max_episode_steps
        return StepOut(new_state, self.observe(params, new_state), reward,
                       terminated, truncated,
                       {"crashed": ego_crash, "speed": speed[0],
                        "cost": any_crash.astype(jnp.float32)})

    def observe(self, params, state: HighwayState):
        if self.controlled_vehicles > 1:
            return tuple(self._observe_single(params, state, e)
                         for e in range(self.controlled_vehicles))
        return self._observe_single(params, state, 0)

    def _observe_single(self, params, state: HighwayState, ego: int):
        if self.obs_type == "occupancy_grid":
            return self._observe_grid(params, state, ego)
        return self._observe_crossing(params, state, ego)

    def _observe_grid(self, params, state: HighwayState, ego: int):
        """Crossing-geometry occupancy grid: rasterize the crossing stream at
        (x-offset to conflict point, their y) and other egos on the x row."""
        N = self.controlled_vehicles
        is_ego_v = jnp.arange(self.vehicles) < N
        dx = jnp.where(is_ego_v, state.x - state.x[ego], -state.x[ego])
        dy = jnp.where(is_ego_v, 0.0, state.x)
        vx = jnp.where(is_ego_v, state.speed - state.speed[ego], 0.0)
        vy = jnp.where(is_ego_v, 0.0, state.speed)
        Hc, Wc = self.grid_shape
        sy, sx = self.grid_step[1], self.grid_step[0]
        ix = jnp.floor(dx / sx + Wc / 2.0).astype(jnp.int32)
        iy = jnp.floor(dy / sy + Hc / 2.0).astype(jnp.int32)
        inside = state.alive & (ix >= 0) & (ix < Wc) & (iy >= 0) & (iy < Hc)
        cell = (inside[:, None, None]
                & (iy[:, None, None] == jnp.arange(Hc)[None, :, None])
                & (ix[:, None, None] == jnp.arange(Wc)[None, None, :]))
        feats = [jnp.ones_like(dx),
                 jnp.clip(dx / params.obs_scale[0], -1, 1),
                 jnp.clip(dy / params.obs_scale[1], -1, 1),
                 jnp.clip(vx / params.obs_scale[2], -1, 1),
                 jnp.clip(vy / params.obs_scale[3], -1, 1)]
        if self.obs_features >= 7:
            cos_h = jnp.where(is_ego_v, 1.0, 0.0)
            feats += [cos_h, 1.0 - cos_h]
        stack = jnp.stack(feats[:self.obs_features], axis=0)
        out = jnp.sum(jnp.where(cell[None, :, :, :],
                                stack[:, :, None, None], 0.0), axis=1)
        return jnp.clip(out, -1.0, 1.0)

    def _observe_crossing(self, params, state: HighwayState, ego: int):
        """Crossing-geometry kinematics: crossing vehicles' positions are
        (their x) on the y-axis relative to ego ``ego`` on the x-axis; other
        egos appear at their true x-axis offsets."""
        N = self.controlled_vehicles
        is_ego_v = jnp.arange(self.vehicles) < N
        dx = jnp.where(is_ego_v, state.x - state.x[ego], -state.x[ego])
        dy = jnp.where(is_ego_v, 0.0, state.x)
        vx = jnp.where(is_ego_v, state.speed - state.speed[ego], 0.0)
        vy = jnp.where(is_ego_v, 0.0, state.speed)
        presence = state.alive.astype(jnp.float32)
        rows = jnp.stack([
            presence,
            jnp.clip(dx / params.obs_scale[0], -1, 1),
            jnp.clip(dy / params.obs_scale[1], -1, 1),
            jnp.clip(vx / params.obs_scale[2], -1, 1),
            jnp.clip(vy / params.obs_scale[3], -1, 1),
        ], axis=1)
        if self.obs_features >= 7:
            # crossing vehicles head along +y, egos along +x
            cos_h = jnp.where(is_ego_v, 1.0, 0.0)
            rows = jnp.concatenate(
                [rows, cos_h[:, None], (1.0 - cos_h)[:, None]], axis=1)
        # same values as the original single-ego row layout: [1, x/100, 0,
        # speed/20, 0] (+ cos_h 1 in the 7-feature form)
        ego_row = jnp.zeros((rows.shape[1],)).at[0].set(1.0) \
            .at[1].set(state.x[ego] / 100.0).at[3].set(state.speed[ego] / 20.0)
        if self.obs_features >= 7:
            ego_row = ego_row.at[5].set(1.0)
        rows = rows.at[ego].set(ego_row)
        if N > 1 and ego != 0:
            # put the observing ego first (ego-first convention)
            order = jnp.arange(self.vehicles).at[0].set(ego).at[ego].set(0)
            rows = rows[order]
        R = min(self.obs_vehicles, self.vehicles)
        return rows[:R]


class TwoWayEnv(HighwayEnv):
    """Two-way road surrogate (highway-env two-way-v0; reference:
    scripts/configs/TwoWayEnv/env.json): the ego drives the right lane
    (index 1) behind slower same-direction traffic and may overtake into the
    oncoming lane (index 0), which carries a stream traveling in -x. Reward
    trades speed for the risk of the oncoming lane; ``info["cost"]`` carries
    the crash indicator the BFTQ budgeted agents constrain."""

    def __init__(self, vehicles: int = 6, max_episode_steps: int = 15,
                 policy_dt: float = 1.0, oncoming: int = 3,
                 obs_type: str = "kinematics", obs_features: int = 5,
                 obs_vehicles: int | None = None, ttc_horizon: int = 10):
        if not 0 <= oncoming <= vehicles - 1:
            raise ValueError("oncoming must leave room for the ego")
        if obs_type not in ("kinematics", "ttc"):
            raise ValueError(f"TwoWayEnv supports kinematics/ttc, not {obs_type}")
        super().__init__(vehicles=vehicles, lanes=2,
                         max_episode_steps=max_episode_steps, policy_dt=policy_dt,
                         obs_type=obs_type, obs_features=obs_features,
                         obs_vehicles=obs_vehicles, ttc_horizon=ttc_horizon)
        self.oncoming = oncoming
        self.spec = EnvSpec("two-way", max_episode_steps)

    def _directions(self):
        # vehicles [V-oncoming, V) travel -x in lane 0
        return jnp.where(jnp.arange(self.vehicles) >= self.vehicles - self.oncoming,
                         -1.0, 1.0)

    def reset(self, params, key):
        V, O = self.vehicles, self.oncoming
        S = V - 1 - O  # same-direction traffic
        kx, ks, ko = jax.random.split(key, 3)
        # ego at 0 on lane 1; slower same-dir traffic ahead on lane 1;
        # oncoming stream ahead on lane 0 heading back toward the ego
        same_x = 30.0 + jnp.cumsum(20.0 + 10.0 * jax.random.uniform(kx, (S,)))
        onc_x = 80.0 + jnp.cumsum(30.0 + 20.0 * jax.random.uniform(ko, (O,)))
        x = jnp.concatenate([jnp.zeros((1,)), same_x, onc_x])
        lane = jnp.concatenate([jnp.ones((1 + S,)), jnp.zeros((O,))])
        speed = jnp.concatenate([jnp.array([15.0]),
                                 8.0 + 2.0 * jax.random.uniform(ks, (S,)),
                                 jnp.full((O,), 10.0)])
        state = HighwayState(
            x=x, lane=lane, target_lane=lane.astype(jnp.int32),
            speed=speed, speed_level=jnp.int32(1),
            alive=jnp.ones((V,), bool), crashed=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def transition(self, params: HighwayParams, state: HighwayState, action, key) -> StepOut:
        V, O = self.vehicles, self.oncoming
        frozen = state.crashed
        direction = self._directions()
        is_ego = jnp.arange(V) == 0
        is_oncoming = direction < 0

        # ego meta-action (full 5-action set; LANE_LEFT = overtake)
        speed_level = jnp.clip(state.speed_level
                               + jnp.where(action == FASTER, 1, 0)
                               - jnp.where(action == SLOWER, 1, 0), 0, 2)
        lane_delta = jnp.where(action == LANE_LEFT, -1, 0) \
            + jnp.where(action == LANE_RIGHT, 1, 0)
        target_lane = jnp.clip(state.target_lane + jnp.where(is_ego, lane_delta, 0),
                               0, 1)

        # same-direction traffic: IDM behind its leader (oncoming vehicles are
        # excluded from leader search by lane-shifting them out of range);
        # the oncoming stream holds constant speed (no MOBIL on a two-way road)
        search_lane = jnp.where(is_oncoming, state.lane + 100.0, state.lane)
        has_l, gap_l, speed_l = self._neighbor_stats(
            state.x, state.speed, search_lane, search_lane, state.alive, True)
        idm_acc = self._idm_from_leader(params, state.speed, jnp.float32(10.0),
                                        has_l, gap_l, speed_l)
        ego_target_speed = jnp.sum(jnp.where(
            jnp.arange(params.target_speeds.shape[0]) == speed_level,
            params.target_speeds, 0.0))
        ego_acc = jnp.clip(ego_target_speed - state.speed[0],
                           -params.idm_b, params.idm_a)
        acc = jnp.where(is_ego, ego_acc, jnp.where(is_oncoming, 0.0, idm_acc))
        speed = jnp.clip(state.speed + acc * params.dt, MIN_SPEED, MAX_SPEED)
        x = state.x + direction * speed * params.dt

        lane = state.lane + jnp.clip(target_lane.astype(jnp.float32) - state.lane,
                                     -params.dt, params.dt)

        # collisions: SWEPT pairwise test — head-on closing speeds (~30 m/s)
        # tunnel through the discrete overlap check in one policy step, so a
        # pair also collides when its relative position changes sign during
        # the step (linear motion => closest approach ~0)
        rel_before = state.x[None, :] - state.x[:, None]
        rel_after = x[None, :] - x[:, None]
        close_x = (jnp.abs(rel_after) < VEHICLE_LENGTH) \
            | (rel_before * rel_after < 0.0)
        close_lane = jnp.abs(lane[None, :] - lane[:, None]) < 0.8
        alive_f = state.alive.astype(jnp.float32)
        both_alive = (alive_f[None, :] * alive_f[:, None]) > 0
        not_self = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) \
            != jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
        ego_crash = jnp.any(close_x[0] & close_lane[0] & both_alive[0] & not_self[0]) \
            | state.crashed

        fm = frozen.astype(jnp.float32)
        new_state = HighwayState(
            x=state.x * fm + x * (1 - fm),
            lane=state.lane * fm + lane * (1 - fm),
            target_lane=target_lane,
            speed=state.speed * fm + speed * (1 - fm),
            speed_level=speed_level, alive=state.alive, crashed=ego_crash,
            t=state.t + 1)

        # reward: speed term plus a bonus for the overtaking (left) lane —
        # the risky behavior the budgeted agents trade against cost
        lo, hi = params.speed_reward_range[0], params.speed_reward_range[1]
        scaled_speed = jnp.clip((speed[0] - lo) / (hi - lo), 0.0, 1.0)
        left_frac = 1.0 - lane[0]
        raw = params.collision_reward * ego_crash.astype(jnp.float32) \
            + params.high_speed_reward * scaled_speed \
            + params.right_lane_reward * left_frac
        reward = (raw - params.collision_reward) \
            / (params.high_speed_reward + params.right_lane_reward - params.collision_reward)
        reward = jnp.where(frozen, 0.0, jnp.clip(reward, 0.0, 1.0))

        terminated = ego_crash
        truncated = new_state.t >= self.max_episode_steps
        return StepOut(new_state, jnp.zeros((1,)), reward, terminated, truncated,
                       {"crashed": ego_crash, "speed": speed[0],
                        "cost": ego_crash.astype(jnp.float32)})

    def _observe_kinematics(self, params, state, ego: int):
        """Kinematics with signed velocities for the oncoming stream."""
        direction = self._directions()
        dx = state.x - state.x[ego]
        dy = (state.lane - state.lane[ego]) * LANE_WIDTH
        vx = direction * state.speed - state.speed[ego]
        vy = jnp.zeros_like(vx)
        dist = jnp.abs(dx) + jnp.abs(dy)
        P = self._sort_permutation(dist.at[ego].set(-1.0))
        cols = [state.alive.astype(jnp.float32),
                jnp.clip(dx / params.obs_scale[0], -1, 1),
                jnp.clip(dy / params.obs_scale[1], -1, 1),
                jnp.clip(vx / params.obs_scale[2], -1, 1),
                jnp.clip(vy / params.obs_scale[3], -1, 1)]
        if self.obs_features >= 7:
            cols += [direction, jnp.zeros_like(vx)]
        rows = jnp.sum(jnp.where(P[:, :, None] > 0,
                                 jnp.stack(cols, axis=1)[None, :, :], 0.0),
                       axis=1)
        presence = rows[:, 0]
        ego_row = jnp.zeros((rows.shape[1],)).at[0].set(1.0) \
            .at[1].set(state.x[ego] / 1000.0).at[3].set(state.speed[ego] / MAX_SPEED)
        if self.obs_features >= 7:
            ego_row = ego_row.at[5].set(1.0)
        rows = rows.at[0].set(ego_row)
        rows = rows * presence[:, None]
        R = min(self.obs_vehicles, self.vehicles)
        return rows[:R]


# ---------------------------------------------------------------------------
# Config-driven construction (reference env variant configs)
# ---------------------------------------------------------------------------

# highway-env behavior presets for "other_vehicles_type"
# (behavior.py IDMVehicle / AggressiveVehicle / DefensiveVehicle /
# LinearVehicle): mapped onto the surrogate's IDM parameter space.
_BEHAVIOR_PRESETS = {
    "AggressiveVehicle": dict(idm_a=4.5, idm_b=6.0, idm_t0=0.8, idm_s0=5.0,
                              mobil_min_gain=0.1, mobil_b_safe=4.0),
    "DefensiveVehicle": dict(idm_a=2.0, idm_b=4.0, idm_t0=2.2, idm_s0=15.0,
                             mobil_min_gain=0.6, mobil_b_safe=1.0),
    "LinearVehicle": dict(idm_a=3.0, idm_b=5.0, idm_t0=1.5, idm_s0=10.0),
    "IDMVehicle": {},
}


def _behavior_overrides(config: dict) -> dict:
    name = str(config.get("other_vehicles_type", "")).rsplit(".", 1)[-1]
    return dict(_BEHAVIOR_PRESETS.get(name, {}))


def _apply_param_overrides(params: HighwayParams, config: dict) -> HighwayParams:
    over = _behavior_overrides(config)
    if "collision_reward" in config:
        over["collision_reward"] = config["collision_reward"]
    if "right_lane_reward" in config:
        over["right_lane_reward"] = config["right_lane_reward"]
    if "left_lane_reward" in config and "right_lane_reward" not in config:
        # TwoWayEnv stores its left(overtake)-lane bonus in the
        # right_lane_reward param slot (highway-env TwoWayEnv config key is
        # left_lane_reward) — map it so the override is not silently dropped
        over["right_lane_reward"] = config["left_lane_reward"]
    if "high_speed_reward" in config:
        over["high_speed_reward"] = config["high_speed_reward"]
    if over:
        params = params._replace(**{k: jnp.float32(v) for k, v in over.items()})
    return params


def _episode_steps(config: dict, default_duration: int) -> int:
    freq = float(config.get("policy_frequency", 1))
    duration = float(config.get("duration", default_duration))
    return max(1, int(round(duration * freq)))


def _obs_kwargs(config: dict) -> dict:
    """Parse the highway-env observation block into surrogate knobs."""
    obs = dict(config.get("observation") or {})
    n_ego = int(config.get("controlled_vehicles", 1))
    if obs.get("type") == "MultiAgentObservation":
        obs = dict(obs.get("observation_config") or {})
        n_ego = max(n_ego, 2)
    kind = {"TimeToCollision": "ttc", "OccupancyGrid": "occupancy_grid",
            "LidarObservation": "lidar"} \
        .get(obs.get("type"), "kinematics")
    # the surrogate emits 5-feature or 7-feature (heading) kinematics rows;
    # size by heading presence, not raw list length (a 6-item list without
    # 'presence' would otherwise declare a space no observation matches)
    features = obs.get("features") or []
    kwargs = dict(controlled_vehicles=n_ego, obs_type=kind,
                  obs_features=7 if ("cos_h" in features or "sin_h" in features)
                  else 5)
    if kind == "ttc":
        kwargs["ttc_horizon"] = int(obs.get("horizon", 10))
    if kind == "lidar":
        if "cells" in obs:
            kwargs["lidar_cells"] = int(obs["cells"])
        if "maximum_range" in obs:
            kwargs["lidar_range"] = float(obs["maximum_range"])
    if kind == "occupancy_grid":
        size = obs.get("grid_size", [[-27.5, 27.5], [-27.5, 27.5]])
        step = obs.get("grid_step", [5, 5])
        kwargs["grid_shape"] = (
            int(round((size[1][1] - size[1][0]) / step[1])),
            int(round((size[0][1] - size[0][0]) / step[0])))
        kwargs["grid_step"] = (float(step[0]), float(step[1]))
    if "vehicles_count" in obs:
        kwargs["obs_vehicles"] = int(obs["vehicles_count"])
    return kwargs


def _action_kwargs(config: dict) -> dict:
    act = dict(config.get("action") or {})
    if act.get("type") == "MultiAgentAction":
        act = dict(act.get("action_config") or {})
    if act.get("type") == "ContinuousAction":
        kwargs = dict(action_type="continuous")
        if "steering_range" in act:
            kwargs["steering_range"] = tuple(act["steering_range"])
        if "acceleration_range" in act:
            kwargs["acceleration_range"] = tuple(act["acceleration_range"])
        return kwargs
    return {}


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    obs_kw = _obs_kwargs(config)
    act_kw = _action_kwargs(config)
    if act_kw.get("action_type") == "continuous":
        obs_kw["controlled_vehicles"] = 1  # continuous control is single-ego
    env = HighwayEnv(vehicles=config.get("vehicles_count", 15),
                     lanes=config.get("lanes_count", 4),
                     max_episode_steps=config.get(
                         "max_episode_steps", _episode_steps(config, 40)),
                     **obs_kw, **act_kw)
    return EnvHandle(env, _apply_param_overrides(env.default_params(), config),
                     config)


def make_intersection(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    obs_kw = _obs_kwargs(config)
    for k in ("ttc_horizon", "lidar_cells", "lidar_range"):
        obs_kw.pop(k, None)
    if obs_kw.get("obs_type") not in ("kinematics", "occupancy_grid"):
        obs_kw["obs_type"] = "kinematics"  # crossing geometry has no ttc/lidar
    vehicles = config.get("vehicles_count",
                          config.get("initial_vehicle_count", 4)
                          + obs_kw["controlled_vehicles"] + 3)
    env = IntersectionEnv(vehicles=vehicles,
                          max_episode_steps=config.get(
                              "max_episode_steps", _episode_steps(config, 26)),
                          **obs_kw)
    return EnvHandle(env, _apply_param_overrides(env.default_params(), config),
                     config)


def make_roundabout(config: dict | None = None) -> EnvHandle:
    """Roundabout surrogate (highway-env roundabout-v0; reference:
    RoundaboutEnv/*.json): approximated as a short 2-lane circulating
    carriageway — the full 5-meta-action set (the corpus's MCTS priors index
    FASTER/SLOWER) with lane-change/insertion interactions; route
    preprocessors are accepted as no-ops on the surrogate geometry."""
    config = dict(config or {})
    config.setdefault("lanes_count", 2)
    config.setdefault("vehicles_count", 10)
    config.setdefault("duration", 11)
    return make(config)


def make_twoway(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    obs_kw = _obs_kwargs(config)
    for k in ("grid_shape", "grid_step", "controlled_vehicles",
              "lidar_cells", "lidar_range"):
        obs_kw.pop(k, None)
    if obs_kw.get("obs_type") not in ("kinematics", "ttc"):
        obs_kw["obs_type"] = "kinematics"
    env = TwoWayEnv(vehicles=config.get("vehicles_count", 6),
                    oncoming=config.get("oncoming", 3),
                    max_episode_steps=config.get(
                        "max_episode_steps", _episode_steps(config, 15)),
                    **obs_kw)
    return EnvHandle(env, _apply_param_overrides(env.default_params(), config),
                     config)
