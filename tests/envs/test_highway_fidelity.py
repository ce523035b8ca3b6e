"""Analytic IDM / MOBIL / intersection fidelity tests (VERDICT r2 item 7).

highway_env cannot be installed in this image (no network), so the surrogate's
traffic model is checked against HAND-DERIVED golden numbers computed from the
published IDM and MOBIL definitions with the surrogate's own parameterisation
(idm: s0=10, T=1.5, a=3, b=5, politeness=0, b_safe=2, min_gain=0.2,
vehicle length 5 — highway-env behavior.py IDMVehicle defaults scaled to the
surrogate's gap convention). Every expected value below is a literal constant
derived in the comment next to it, independently of the implementation.

The live-package cross-check remains in test_highway_bridge_parity.py (it
importorskips highway_env and runs wherever the package exists).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.envs.highway import (
    HighwayEnv,
    HighwayState,
    IntersectionEnv,
)


def _state(env, x, lane, speed, target_lane=None):
    V = env.vehicles
    lane = jnp.asarray(lane, jnp.float32)
    return HighwayState(
        x=jnp.asarray(x, jnp.float32),
        lane=lane,
        target_lane=(jnp.asarray(target_lane, jnp.int32) if target_lane is not None
                     else lane.astype(jnp.int32)),
        speed=jnp.asarray(speed, jnp.float32),
        speed_level=jnp.int32(1),
        alive=jnp.ones((V,), bool),
        crashed=jnp.zeros((), bool),
        t=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# IDM longitudinal model
# ---------------------------------------------------------------------------

def test_idm_free_road_acceleration():
    """No leader: a = a_max (1 - (v/v0)^4).
    v=20, v0=25: 3 * (1 - (0.8)^4) = 3 * (1 - 0.4096) = 1.7712."""
    env = HighwayEnv(vehicles=2, lanes=4)
    params = env.default_params()
    # the two vehicles sit in different lanes -> both leaderless
    s = _state(env, x=[0.0, 0.0], lane=[0, 2], speed=[20.0, 20.0])
    acc = env._idm_acceleration(params, s, jnp.float32(25.0))
    np.testing.assert_allclose(np.asarray(acc), [1.7712, 1.7712], rtol=1e-5)


def test_idm_approaching_slower_leader_brakes_at_limit():
    """v=25 closing on a v=20 leader at 30 m center-to-center:
    d = 30 - 5 = 25;  s* = 10 + 25*1.5 + 25*5 / (2 sqrt(15))
      = 10 + 37.5 + 16.13743... = 63.63743;
    interaction = (63.63743 / 25)^2 = 6.47956;
    raw a = 3 (1 - 1 - 6.47956) = -19.4387  ->  clipped to -b = -5."""
    env = HighwayEnv(vehicles=2, lanes=4)
    params = env.default_params()
    s = _state(env, x=[0.0, 30.0], lane=[1, 1], speed=[25.0, 20.0])
    acc = env._idm_acceleration(params, s, jnp.float32(25.0))
    np.testing.assert_allclose(float(acc[0]), -5.0, rtol=1e-6)
    # the leader itself is free: 3 (1 - (20/25)^4) = 1.7712
    np.testing.assert_allclose(float(acc[1]), 1.7712, rtol=1e-5)


def test_idm_equal_speed_at_desired_gap():
    """Same speed v=20, gap 45: d = 40; s* = 10 + 20*1.5 + 0 = 40;
    interaction = (40/40)^2 = 1; a = 3 (1 - 0.4096 - 1) = -1.2288."""
    env = HighwayEnv(vehicles=2, lanes=4)
    params = env.default_params()
    s = _state(env, x=[0.0, 45.0], lane=[1, 1], speed=[20.0, 20.0])
    acc = env._idm_acceleration(params, s, jnp.float32(25.0))
    np.testing.assert_allclose(float(acc[0]), -1.2288, rtol=1e-5)


# ---------------------------------------------------------------------------
# MOBIL lane changes
# ---------------------------------------------------------------------------

def _mobil(env, state):
    params = env.default_params()
    new_target, _ = env._mobil_target_lanes(params, state,
                                            state.target_lane, jnp.float32(25.0))
    return np.asarray(new_target)


def test_mobil_changes_away_from_slow_leader():
    """Mover (idx 1, lane 1, v=25) is stuck behind a v=15 leader at gap 25:
    acc_here clips to -5. Left lane 0 is empty (gain 0-(-5)=5 > 0.2, safe);
    right lane 2 holds the ego 450 m ahead, so its gain is slightly lower
    (interaction (47.5/445)^2 = 0.0114 -> acc -0.0342, gain 4.9658).
    Ties go left: target lane becomes 0."""
    env = HighwayEnv(vehicles=4, lanes=3)
    s = _state(env,
               x=[500.0, 50.0, 75.0, -500.0],
               lane=[2, 1, 1, 1],
               speed=[25.0, 25.0, 15.0, 25.0])
    out = _mobil(env, s)
    assert out[1] == 0, out
    assert out[2] == 1 and out[3] == 1  # leader and far follower stay


def test_mobil_safety_veto_blocks_change():
    """Same stuck mover, but the only adjacent lane has a follower 3 m
    behind: the follower's braking after the change, IDM at d = max(3-5,·)
    -> floor 1 m, is far below -b_safe = -2, so the change is vetoed."""
    env = HighwayEnv(vehicles=3, lanes=2)
    s = _state(env,
               x=[47.0, 50.0, 75.0],
               lane=[1, 0, 0],
               speed=[25.0, 25.0, 15.0])
    out = _mobil(env, s)
    assert out[1] == 0, out


def test_mobil_no_gain_no_change():
    """A free-road mover gains nothing by changing (0 < min_gain 0.2)."""
    env = HighwayEnv(vehicles=2, lanes=2)
    s = _state(env, x=[1000.0, 0.0], lane=[0, 0], speed=[25.0, 25.0])
    out = _mobil(env, s)
    assert out[1] == 0, out


def test_mobil_concurrent_movers_rear_suppressed():
    """Vehicles 1 (lane 0) and 2 (lane 2) are both stuck behind slow leaders
    and both want the middle lane. They are 2 m apart longitudinally — inside
    the rear's desired gap (5 + 10 + 25*1.5 = 52.5) — so letting both change
    would create an unphysical merge. The REAR mover (idx 1, x=50 < 52) is
    suppressed; the front mover changes (advisor r2 finding)."""
    env = HighwayEnv(vehicles=5, lanes=3)
    s = _state(env,
               x=[1000.0, 50.0, 52.0, 70.0, 72.0],
               lane=[1, 0, 2, 0, 2],
               speed=[25.0, 25.0, 25.0, 10.0, 10.0])
    out = _mobil(env, s)
    assert out[2] == 1, out   # front mover enters the middle lane
    assert out[1] == 0, out   # rear mover suppressed


def test_mobil_distant_movers_both_change():
    """Same two movers but 120 m apart — outside the desired gap — both
    changes are physical and both happen."""
    env = HighwayEnv(vehicles=5, lanes=3)
    s = _state(env,
               x=[1000.0, 50.0, 170.0, 70.0, 190.0],
               lane=[1, 0, 2, 0, 2],
               speed=[25.0, 25.0, 25.0, 10.0, 10.0])
    out = _mobil(env, s)
    assert out[1] == 1 and out[2] == 1, out


# ---------------------------------------------------------------------------
# Intersection conflict zone
# ---------------------------------------------------------------------------

def test_intersection_conflict_crash():
    """Ego at x=-8 (v=10) reaches x=+2 after one 1 s step; the crossing
    vehicle at -9 (v=8) reaches -1. Both are within the +-5 m conflict zone
    -> crash, reward 0, terminal."""
    env = IntersectionEnv(vehicles=2)
    params = env.default_params()
    s = _state(env, x=[-8.0, -9.0], lane=[0, 0], speed=[10.0, 8.0])
    out = env.step(params, s, jnp.int32(1), jnp.zeros((2,), jnp.uint32))
    assert bool(out.terminated) and bool(out.info["crashed"])
    assert float(out.reward) == 0.0


def test_intersection_crossing_clears():
    """Same geometry but the crossing vehicle already passed (x=+6 -> +14):
    never inside the zone together -> no crash; reward = 0.5 * v/10 = 0.5."""
    env = IntersectionEnv(vehicles=2)
    params = env.default_params()
    s = _state(env, x=[-8.0, 6.0], lane=[0, 0], speed=[10.0, 8.0])
    out = env.step(params, s, jnp.int32(1), jnp.zeros((2,), jnp.uint32))
    assert not bool(out.info["crashed"])
    np.testing.assert_allclose(float(out.reward), 0.5, rtol=1e-5)
