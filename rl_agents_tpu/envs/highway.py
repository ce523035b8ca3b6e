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

from rl_agents_tpu.envs.base import Box, Discrete, EnvHandle, EnvSpec, FunctionalEnv, StepOut

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
    def __init__(self, vehicles: int = 15, lanes: int = 4, max_episode_steps: int = 40,
                 policy_dt: float = 1.0):
        self.vehicles = vehicles
        self.lanes = lanes
        self.max_episode_steps = max_episode_steps
        self.policy_dt = policy_dt
        self.spec = EnvSpec("highway", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(5)

    @property
    def observation_space(self):
        return Box(-1.0, 1.0, (self.vehicles, 5))

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
        speed = speed.at[0].set(25.0)
        state = HighwayState(
            x=x, lane=lane.astype(jnp.float32), target_lane=lane.astype(jnp.int32),
            speed=speed, speed_level=jnp.int32(1),
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
        is_traffic = jnp.arange(V) != 0
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
        frozen = state.crashed

        # --- ego meta-action ------------------------------------------
        speed_level = jnp.clip(state.speed_level
                               + jnp.where(action == FASTER, 1, 0)
                               - jnp.where(action == SLOWER, 1, 0), 0, 2)
        is_ego = jnp.arange(V) == 0
        lane_delta = jnp.where(action == LANE_LEFT, -1, 0) + jnp.where(action == LANE_RIGHT, 1, 0)
        target_lane = jnp.clip(state.target_lane + jnp.where(is_ego, lane_delta, 0), 0, L - 1)
        # traffic MOBIL lane changes (ego excluded inside); reuses the
        # current-lane leader pass for the IDM acceleration below
        target_lane, idm_acc = self._mobil_target_lanes(
            params, state, target_lane, jnp.float32(25.0))

        # --- longitudinal dynamics ------------------------------------
        # traffic follows IDM; the ego tracks its target speed directly (it
        # can rear-end — collision avoidance is the planner's job, as in
        # highway-env's ControlledVehicle)
        ego_target_speed = jnp.sum(jnp.where(
            jnp.arange(params.target_speeds.shape[0]) == speed_level,
            params.target_speeds, 0.0))
        ego_acc = jnp.clip(ego_target_speed - state.speed[0], -params.idm_b, params.idm_a)
        acc = jnp.where(is_ego, ego_acc, idm_acc)  # scatter-free (Mosaic has no scatter)
        speed = jnp.clip(state.speed + acc * params.dt, MIN_SPEED, MAX_SPEED)
        x = state.x + speed * params.dt

        # --- lateral dynamics: first-order pull to target lane --------
        lane = state.lane + jnp.clip(target_lane.astype(jnp.float32) - state.lane,
                                     -params.dt, params.dt)

        # --- collisions ------------------------------------------------
        close_x = jnp.abs(x[None, :] - x[:, None]) < VEHICLE_LENGTH
        close_lane = jnp.abs(lane[None, :] - lane[:, None]) < 0.8
        alive_f2 = state.alive.astype(jnp.float32)
        both_alive = (alive_f2[None, :] * alive_f2[:, None]) > 0
        not_self = jax.lax.broadcasted_iota(jnp.int32, (V, V), 0) \
            != jax.lax.broadcasted_iota(jnp.int32, (V, V), 1)
        colliding = close_x & close_lane & both_alive & not_self
        ego_crash = jnp.any(colliding[0]) | state.crashed

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
        scaled_speed = jnp.clip((speed[0] - lo) / (hi - lo), 0.0, 1.0)
        lane_frac = lane[0] / jnp.maximum(L - 1, 1)
        raw = params.collision_reward * ego_crash.astype(jnp.float32) \
            + params.high_speed_reward * scaled_speed \
            + params.right_lane_reward * lane_frac
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
        """Kinematics observation: ego-relative, distance-sorted, normalized."""
        V = self.vehicles
        dx = state.x - state.x[0]
        dy = (state.lane - state.lane[0]) * LANE_WIDTH
        vx = state.speed - state.speed[0]
        vy = jnp.zeros_like(vx)
        dist = jnp.abs(dx) + jnp.abs(dy)
        order = jnp.argsort(dist.at[0].set(-1.0))  # ego first
        presence = state.alive[order].astype(jnp.float32)
        rows = jnp.stack([
            presence,
            jnp.clip(dx[order] / params.obs_scale[0], -1, 1),
            jnp.clip(dy[order] / params.obs_scale[1], -1, 1),
            jnp.clip(vx[order] / params.obs_scale[2], -1, 1),
            jnp.clip(vy[order] / params.obs_scale[3], -1, 1),
        ], axis=1)
        # ego row carries absolute features like highway-env
        ego_row = jnp.array([1.0, 1.0, 0.0, 0.0, 0.0]) * jnp.stack(
            [1.0, state.x[0] / 1000.0, state.lane[0] / jnp.maximum(self.lanes - 1, 1),
             state.speed[0] / MAX_SPEED, 0.0])
        rows = rows.at[0].set(ego_row)
        return rows * presence[:, None]

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
        if name in ("change_vehicles", "set_route_at_intersection"):
            return self
        raise ValueError(f"HighwayEnv has no preprocessor {name!r}")


class IntersectionEnv(HighwayEnv):
    """Crossing-streams surrogate of intersection-v0: the ego travels along
    +x; crossing traffic travels along +y through a conflict zone at the
    origin. Meta-actions control ego speed only (highway-env's intersection
    uses 3 speed actions: SLOWER, IDLE, FASTER)."""

    def __init__(self, vehicles: int = 8, max_episode_steps: int = 26,
                 policy_dt: float = 1.0):
        super().__init__(vehicles=vehicles, lanes=1,
                         max_episode_steps=max_episode_steps, policy_dt=policy_dt)
        self.spec = EnvSpec("intersection", max_episode_steps)

    @property
    def action_space(self):
        return Discrete(3)  # SLOWER, IDLE, FASTER

    def reset(self, params, key):
        V = self.vehicles
        kx, ks = jax.random.split(key)
        # ego approaches from x=-60; crossing vehicles from y in [-100, -20]
        x = jnp.concatenate([jnp.array([-60.0]),
                             -100.0 + 80.0 * jax.random.uniform(kx, (V - 1,))])
        speed = jnp.concatenate([jnp.array([10.0]),
                                 8.0 + 4.0 * jax.random.uniform(ks, (V - 1,))])
        state = HighwayState(
            x=x, lane=jnp.zeros((V,)), target_lane=jnp.zeros((V,), jnp.int32),
            speed=speed, speed_level=jnp.int32(1),
            alive=jnp.ones((V,), bool), crashed=jnp.zeros((), bool),
            t=jnp.zeros((), jnp.int32))
        return state, self.observe(params, state)

    def step(self, params, state: HighwayState, action, key) -> StepOut:
        V = self.vehicles
        frozen = state.crashed
        speed_level = jnp.clip(state.speed_level
                               + jnp.where(action == 2, 1, 0)
                               - jnp.where(action == 0, 1, 0), 0, 2)
        ego_target = params.target_speeds[speed_level] * 10.0 / 25.0
        acc = jnp.where(jnp.arange(V) == 0,
                        2.0 * (ego_target - state.speed),
                        0.0)
        speed = jnp.clip(state.speed + acc * params.dt, 0.0, 20.0)
        x = state.x + speed * params.dt

        # conflict: ego on x-axis, others on y-axis; both near origin -> crash
        ego_near = jnp.abs(x[0]) < VEHICLE_LENGTH
        others_near = jnp.abs(x) < VEHICLE_LENGTH
        ego_crash = (ego_near & jnp.any(others_near[1:])) | state.crashed

        new_state = HighwayState(
            x=jnp.where(frozen, state.x, x), lane=state.lane,
            target_lane=state.target_lane,
            speed=jnp.where(frozen, state.speed, speed),
            speed_level=speed_level, alive=state.alive, crashed=ego_crash,
            t=state.t + 1)

        arrived = x[0] > 25.0
        scaled_speed = jnp.clip(speed[0] / 10.0, 0.0, 1.0)
        reward = jnp.where(ego_crash, 0.0,
                           jnp.where(arrived, 1.0, 0.5 * scaled_speed))
        reward = jnp.where(frozen, 0.0, reward)
        terminated = ego_crash | arrived
        truncated = new_state.t >= self.max_episode_steps
        return StepOut(new_state, self.observe(params, new_state), reward,
                       terminated, truncated,
                       {"crashed": ego_crash, "speed": speed[0],
                        "cost": ego_crash.astype(jnp.float32)})

    def observe(self, params, state: HighwayState):
        """Crossing-geometry kinematics: others' positions are (their x) on
        the y-axis relative to the ego on the x-axis."""
        dx = jnp.where(jnp.arange(self.vehicles) == 0, 0.0, -state.x[0])
        dy = jnp.where(jnp.arange(self.vehicles) == 0, 0.0, state.x)
        vx = jnp.zeros_like(state.x)
        vy = jnp.where(jnp.arange(self.vehicles) == 0, 0.0, state.speed)
        presence = state.alive.astype(jnp.float32)
        rows = jnp.stack([
            presence,
            jnp.clip(dx / params.obs_scale[0], -1, 1),
            jnp.clip(dy / params.obs_scale[1], -1, 1),
            jnp.clip(vx / params.obs_scale[2], -1, 1),
            jnp.clip(vy / params.obs_scale[3], -1, 1),
        ], axis=1)
        ego_row = jnp.stack([1.0, state.x[0] / 100.0, 0.0, state.speed[0] / 20.0, 0.0])
        return rows.at[0].set(ego_row)


def make(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = HighwayEnv(vehicles=config.get("vehicles_count", 15),
                     lanes=config.get("lanes_count", 4),
                     max_episode_steps=config.get("max_episode_steps",
                                                  config.get("duration", 40)))
    return EnvHandle(env, env.default_params(), config)


def make_intersection(config: dict | None = None) -> EnvHandle:
    config = dict(config or {})
    env = IntersectionEnv(vehicles=config.get("vehicles_count", 8),
                          max_episode_steps=config.get("max_episode_steps",
                                                       config.get("duration", 26)))
    return EnvHandle(env, env.default_params(), config)
