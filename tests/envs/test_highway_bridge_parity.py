"""Highway surrogate fidelity contract.

The functional HighwayEnv (envs/highway.py) is a planning surrogate for the
real ``highway-env`` package (BASELINE configs 4-5). Two layers of checks:

* structural tests (always run): the surrogate exposes highway-env's
  observation layout (Kinematics: rows [presence, x, y, vx, vy], ego first,
  distance-sorted, normalized to [-1, 1]) and its normalized reward
  combination (collision / high-speed / right-lane terms mapped to [0, 1],
  reference highway-env AbstractEnv._reward semantics);
* cross-check vs the real package through the gym bridge — gated on
  ``highway_env`` being installed, which it is NOT in this image
  (importorskip documents the contract and activates wherever the package
  exists).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.envs.highway import HighwayEnv


def make_env():
    env = HighwayEnv(vehicles=8, lanes=4, max_episode_steps=40)
    params = env.default_params()
    state, obs = env.reset(params, jax.random.PRNGKey(0))
    return env, params, state, obs


def test_observation_layout_matches_highway_env_kinematics():
    env, params, state, obs = make_env()
    obs = np.asarray(obs)
    assert obs.shape == (8, 5)  # [vehicles, (presence, x, y, vx, vy)]
    # ego row first, present, absolute features
    assert obs[0, 0] == 1.0
    # presence column is 0/1 and masks absent rows entirely
    assert set(np.unique(obs[:, 0])).issubset({0.0, 1.0})
    absent = obs[:, 0] == 0.0
    assert np.all(obs[absent] == 0.0)
    # non-ego rows are ego-relative and normalized to [-1, 1]
    assert np.all(obs[1:, 1:] >= -1.0) and np.all(obs[1:, 1:] <= 1.0)
    # non-ego rows sorted by distance to ego (highway-env sort="sorted"):
    # check in raw units (obs columns are normalized by different x/y scales)
    scale = np.asarray(params.obs_scale)
    present = obs[1:, 0] > 0
    unclipped = np.all(np.abs(obs[1:, 1:3]) < 1.0, axis=1) & present
    dist = np.abs(obs[1:, 1] * scale[0]) + np.abs(obs[1:, 2] * scale[1])
    d = dist[unclipped]
    assert np.all(np.diff(d) >= -1e-3)


def test_reward_matches_highway_env_normalization():
    """reward = (raw - collision_reward) / (high_speed + right_lane -
    collision_reward), clipped to [0, 1] — highway-env's normalized
    combination. Faster is better, right lane is better, crashing floors."""
    env, params, state, _ = make_env()
    key = jax.random.PRNGKey(1)
    out = env.step(params, state, jnp.int32(1), key)  # IDLE
    assert 0.0 <= float(out.reward) <= 1.0

    # FASTER (3) eventually beats SLOWER (4) in reward via the speed term
    s_fast = state
    s_slow = state
    for _ in range(3):
        s_fast = env.step(params, s_fast, jnp.int32(3), key).state
        s_slow = env.step(params, s_slow, jnp.int32(4), key).state
    r_fast = float(env.step(params, s_fast, jnp.int32(1), key).reward)
    r_slow = float(env.step(params, s_slow, jnp.int32(1), key).reward)
    assert r_fast > r_slow

    # crashed ego -> frozen zero reward thereafter
    crashed = s_fast._replace(crashed=jnp.ones_like(s_fast.crashed))
    out = env.step(params, crashed, jnp.int32(1), key)
    assert float(out.reward) == 0.0


def test_action_semantics_match_highway_env_meta_actions():
    env, params, state, _ = make_env()
    assert env.action_space.n == 5  # LANE_LEFT, IDLE, LANE_RIGHT, FASTER, SLOWER
    key = jax.random.PRNGKey(2)
    lane0 = int(np.asarray(state.target_lane)[0])
    left = env.step(params, state, jnp.int32(0), key).state
    right = env.step(params, state, jnp.int32(2), key).state
    assert int(np.asarray(left.target_lane)[0]) <= lane0
    assert int(np.asarray(right.target_lane)[0]) >= lane0


def test_bridge_cross_check_against_real_highway_env():
    """Real-package cross-check (runs only where highway_env is installed):
    same observation tensor shape/layout and reward range on the matched
    config, through the gym bridge the factory uses for `highway-env` ids
    (reference: factory.py:59-94)."""
    pytest.importorskip("highway_env")
    import gymnasium as gym

    real = gym.make("highway-v0")
    real.unwrapped.configure({
        "observation": {"type": "Kinematics", "vehicles_count": 8},
        "lanes_count": 4, "vehicles_count": 8,
    })
    obs_real, _ = real.reset(seed=0)
    env, params, state, obs = make_env()
    assert np.asarray(obs).shape == np.asarray(obs_real).shape
    assert real.action_space.n == env.action_space.n
    _, r, *_ = real.step(1)
    assert 0.0 <= r <= 1.0
