"""Reference env-variant parity: multi-agent tuple observations, continuous
action, TimeToCollision and OccupancyGrid observations, behavior presets
(reference configs: HighwayEnv/env_multi_agent.json, env_continuous.json,
env_obs_attention.json, TwoWayEnv/env.json, IntersectionEnv/env_grid.json,
env_multi_agent.json, MergeEnv/env_agg.json)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.envs.highway import (HighwayEnv, HighwayState, IntersectionEnv,
                                        TwoWayEnv, LANE_WIDTH, make, make_twoway)
from rl_agents_tpu.factory import load_agent, load_environment

CONFIGS = "scripts/configs"


def _state(env, x, lane, speed, level=None):
    V = env.vehicles
    N = env.controlled_vehicles
    if level is None:
        level = jnp.int32(1) if N == 1 else jnp.ones((N,), jnp.int32)
    return HighwayState(
        x=jnp.asarray(x, jnp.float32), lane=jnp.asarray(lane, jnp.float32),
        target_lane=jnp.asarray(lane, jnp.int32).astype(jnp.int32),
        speed=jnp.asarray(speed, jnp.float32), speed_level=level,
        alive=jnp.ones((V,), bool), crashed=jnp.zeros((), bool),
        t=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# Multi-agent (reference: env_multi_agent.json -> MultiAgentObservation/Action)
# ---------------------------------------------------------------------------

def test_multi_agent_highway_tuple_obs_and_actions():
    env = load_environment(f"{CONFIGS}/HighwayEnv/env_multi_agent.json")
    assert env.functional.controlled_vehicles == 3
    obs, _ = env.reset(seed=3)
    assert isinstance(obs, tuple) and len(obs) == 3
    assert all(o.shape == (15, 5) for o in obs)
    # each ego's own row leads its observation (presence 1, relative zeros)
    for o in obs:
        assert o[0, 0] == 1.0
    obs2, r, term, trunc, info = env.step((1, 1, 1))
    assert isinstance(obs2, tuple) and np.isfinite(r)


def test_multi_agent_reward_is_mean_of_per_ego_rewards():
    env = HighwayEnv(vehicles=6, lanes=4, controlled_vehicles=2)
    params = env.default_params()
    # two egos far apart from traffic, distinct lanes/speeds
    st = _state(env, x=[0., 200., 400., 500., 600., 700.],
                lane=[3., 0., 1., 2., 1., 0.],
                speed=[25., 25., 20., 20., 20., 20.])
    out = env.step(params, st, jnp.array([1, 1]), jax.random.PRNGKey(0))
    # recompute the two per-ego rewards by running two single-ego twins
    single = HighwayEnv(vehicles=6, lanes=4)

    def solo_reward(ego_lane, ego_speed):
        lo, hi = params.speed_reward_range
        scaled = jnp.clip((ego_speed - lo) / (hi - lo), 0, 1)
        raw = params.high_speed_reward * scaled \
            + params.right_lane_reward * ego_lane / 3.0
        return float((raw - params.collision_reward)
                     / (params.high_speed_reward + params.right_lane_reward
                        - params.collision_reward))

    r0 = solo_reward(float(out.state.lane[0]), float(out.state.speed[0]))
    r1 = solo_reward(float(out.state.lane[1]), float(out.state.speed[1]))
    assert float(out.reward) == pytest.approx(
        min((r0 + r1) / 2, 1.0), abs=1e-5)


def test_multi_agent_any_ego_crash_terminates():
    env = HighwayEnv(vehicles=4, lanes=2, controlled_vehicles=2)
    params = env.default_params()
    # ego 1 overlapping a traffic vehicle -> immediate crash
    st = _state(env, x=[0., 100., 101., 300.], lane=[0., 1., 1., 0.],
                speed=[25., 25., 20., 20.])
    out = env.step(params, st, jnp.array([1, 1]), jax.random.PRNGKey(0))
    assert bool(out.terminated)
    assert bool(out.state.crashed)


def test_multi_agent_dqn_end_to_end():
    """The DQN multi-agent record/act path driven by a REAL tuple-obs env
    (VERDICT r3 item 4; reference: deep_q_network/abstract.py record loop)."""
    env = load_environment(f"{CONFIGS}/IntersectionEnv/env_multi_agent.json")
    agent = load_agent({"__class__": "DQNAgent",
                        "model": {"type": "MultiLayerPerceptron", "layers": [16, 16]},
                        "batch_size": 8, "memory_capacity": 64,
                        "exploration": {"method": "EpsilonGreedy", "tau": 100}},
                       env)
    obs, _ = env.reset(seed=0)
    for _ in range(6):
        action = agent.act(obs)
        assert isinstance(action, tuple) and len(action) == 4
        nobs, reward, done, trunc, info = env.step(action)
        agent.record(obs, action, reward, nobs, done, info)
        obs = nobs
        if done or trunc:
            obs, _ = env.reset()
    assert len(agent.memory) >= 6 * 4  # each transition pushed per ego


# ---------------------------------------------------------------------------
# ContinuousAction (reference: env_continuous.json)
# ---------------------------------------------------------------------------

def test_continuous_action_space_and_steering():
    env = load_environment(f"{CONFIGS}/HighwayEnv/env_continuous.json")
    f = env.functional
    assert f.action_type == "continuous"
    assert f.action_space.shape == (2,)
    assert f.steering_range == (-0.1, 0.1)
    params = env.params
    st = _state(f, x=[0., 500., 600., 700., 800.], lane=[2., 0., 1., 0., 1.],
                speed=[20., 20., 20., 20., 20.], level=jnp.int32(1))
    # full-left steering moves the ego toward lane 0; traffic stays put
    out = f.step(params, st, jnp.array([0.0, -1.0]), jax.random.PRNGKey(0))
    assert float(out.state.lane[0]) < 2.0
    # positive acceleration raises speed, negative lowers it
    up = f.step(params, st, jnp.array([1.0, 0.0]), jax.random.PRNGKey(0))
    down = f.step(params, st, jnp.array([-1.0, 0.0]), jax.random.PRNGKey(0))
    assert float(up.state.speed[0]) > float(st.speed[0]) > float(down.state.speed[0])


def test_continuous_cem_smoke():
    env = load_environment(f"{CONFIGS}/HighwayEnv/env_continuous.json")
    agent = load_agent(f"{CONFIGS}/Pendulum/cem.json", env)
    obs, _ = env.reset(seed=0)
    action = np.asarray(agent.act(obs), np.float32).reshape(-1)
    assert action.shape[-1] == 2
    # the env clips raw CEM commands like highway-env's ContinuousAction
    obs2, r, term, trunc, info = env.step(action)
    assert np.isfinite(r) and np.all(np.isfinite(obs2))


# ---------------------------------------------------------------------------
# TimeToCollision observation (reference: TwoWayEnv/env.json)
# ---------------------------------------------------------------------------

def test_ttc_observation_bins():
    env = TwoWayEnv(vehicles=4, oncoming=1, obs_type="ttc", ttc_horizon=5)
    params = env.default_params()
    # same-dir leader 40m ahead in ego's lane at 10 m/s; ego candidate speeds
    # are target_speeds [20, 25, 30] -> closing 10/15/20 -> ttc 4/2.67/2
    st = _state(env, x=[0., 40., 200., 300.], lane=[1., 1., 1., 0.],
                speed=[15., 10., 10., 10.], level=jnp.int32(1))
    obs = np.asarray(env.observe(params, st))
    assert obs.shape == (3, 2, 5)
    assert obs[0, 1, 4] == 1.0   # speed 20: ttc 4.0 -> bin 4, lane 1
    assert obs[1, 1, 2] == 1.0   # speed 25: ttc 2.67 -> bin 2
    assert obs[2, 1, 2] == 1.0   # speed 30: ttc 2.0 -> bin 2
    # oncoming vehicle at 300m closing at (v_ego + 10) -> ttc 10+ is off-grid
    assert obs[:, 0, :].sum() == 0.0


def test_ttc_oncoming_closing_speed():
    env = TwoWayEnv(vehicles=3, oncoming=1, obs_type="ttc", ttc_horizon=10)
    params = env.default_params()
    # oncoming at 90m closing at 20+10=30 -> ttc 3 for level 0
    st = _state(env, x=[0., 500., 90.], lane=[1., 1., 0.],
                speed=[15., 10., 10.], level=jnp.int32(1))
    obs = np.asarray(env.observe(params, st))
    assert obs[0, 0, 3] == 1.0   # (90 / (20+10)) = 3.0
    assert obs[2, 0, 2] == 1.0   # (90 / (30+10)) = 2.25 -> bin 2


def test_twoway_config_and_headon_crash():
    env = make_twoway({"observation": {"type": "TimeToCollision", "horizon": 5}})
    assert env.functional.obs_type == "ttc"
    f = TwoWayEnv(vehicles=4, oncoming=1)
    params = f.default_params()
    # ego overtaking in lane 0 meets the oncoming stream head-on
    st = _state(f, x=[0., 100., 120., 6.], lane=[0., 1., 1., 0.],
                speed=[15., 10., 10., 10.], level=jnp.int32(1))
    out = f.step(params, st, jnp.int32(1), jax.random.PRNGKey(0))
    assert bool(out.state.crashed)
    assert float(out.info["cost"]) == 1.0


# ---------------------------------------------------------------------------
# OccupancyGrid observation (reference: IntersectionEnv/env_grid.json)
# ---------------------------------------------------------------------------

def test_occupancy_grid_cells():
    env = HighwayEnv(vehicles=3, lanes=4, obs_type="occupancy_grid",
                     obs_features=5, grid_shape=(11, 11), grid_step=(5.0, 5.0))
    params = env.default_params()
    # vehicle 1 at dx=+12m, same lane -> cell (y center row 5, x col 7)
    st = _state(env, x=[0., 12., 500.], lane=[1., 1., 1.],
                speed=[20., 25., 20.], level=jnp.int32(1))
    obs = np.asarray(env.observe(params, st))
    assert obs.shape == (5, 11, 11)
    assert obs[0, 5, 7] == 1.0          # presence
    assert obs[0].sum() == 2.0          # ego cell + one vehicle in range
    assert obs[3, 5, 7] == pytest.approx(5.0 / 20.0)  # vx=+5 normalized


def test_occupancy_grid_from_config():
    env = load_environment(f"{CONFIGS}/IntersectionEnv/env_grid.json")
    obs, _ = env.reset(seed=0)
    assert obs.shape == (7, 11, 11)
    # a ConvolutionalNetwork DQN sizes itself from the grid
    agent = load_agent(f"{CONFIGS}/IntersectionEnv/agents/DQNAgent/grid_convnet.json", env)
    a = agent.act(obs)
    assert 0 <= int(a) < 3


# ---------------------------------------------------------------------------
# 7-feature kinematics (reference: env_obs_attention.json)
# ---------------------------------------------------------------------------

def test_seven_feature_kinematics_heading():
    env = load_environment(f"{CONFIGS}/HighwayEnv/env_obs_attention.json")
    f = env.functional
    assert f.obs_features == 7
    obs, _ = env.reset(seed=0)
    assert obs.shape == (15, 7)
    # straight driving: cos_h ~ 1, sin_h ~ 0 for present vehicles
    present = obs[:, 0] > 0
    assert np.allclose(obs[present, 5], 1.0, atol=1e-2)
    assert np.allclose(obs[present, 6], 0.0, atol=1e-2)
    # the 7-feature ego-attention DQN config consumes it directly
    agent = load_agent(f"{CONFIGS}/ExitEnv/agents/DQNAgent/ego_attention_7feat.json", env)
    assert 0 <= int(agent.act(obs)) < 5


# ---------------------------------------------------------------------------
# Behavior presets (reference: MergeEnv env_agg/env_def, change_vehicles)
# ---------------------------------------------------------------------------

def test_behavior_presets_from_env_config():
    agg = load_environment(f"{CONFIGS}/MergeEnv/env_agg.json")
    de = load_environment(f"{CONFIGS}/MergeEnv/env_def.json")
    assert float(agg.params.idm_a) > float(de.params.idm_a)
    assert float(agg.params.idm_t0) < float(de.params.idm_t0)


def test_change_vehicles_preprocessor():
    env = load_environment({"id": "highway", "vehicles_count": 6})
    before = float(env.params.idm_a)
    new = env.preprocess("change_vehicles",
                         "highway_env.vehicle.behavior.AggressiveVehicle")
    assert float(new.params.idm_a) == pytest.approx(4.5)
    assert float(env.params.idm_a) == before  # original untouched
    # the robust ensemble path: two preprocessed models differ
    de = env.preprocess("change_vehicles",
                        "highway_env.vehicle.behavior.DefensiveVehicle")
    assert float(de.params.idm_t0) > float(new.params.idm_t0)


# ---------------------------------------------------------------------------
# LidarObservation (reference: ExitEnv/env_lidar.json)
# ---------------------------------------------------------------------------

def test_lidar_observation_sectors():
    env = HighwayEnv(vehicles=3, lanes=4, obs_type="lidar",
                     lidar_cells=8, lidar_range=64.0)
    params = env.default_params()
    # vehicle 1 dead ahead at 32m closing at -5 (slower); vehicle 2 out of range
    st = _state(env, x=[0., 32., 500.], lane=[1., 1., 1.],
                speed=[25., 20., 20.], level=jnp.int32(1))
    obs = np.asarray(env.observe(params, st))
    assert obs.shape == (8, 2)
    assert obs[0, 0] == pytest.approx(0.5)        # sector 0 = +x, 32/64
    assert obs[0, 1] == pytest.approx(5.0 / 40.0)  # closing at +5 m/s
    # all other sectors report max range, zero closing speed
    assert np.allclose(obs[1:, 0], 1.0)
    assert np.allclose(obs[1:, 1], 0.0)


def test_lidar_from_exit_config():
    env = load_environment(f"{CONFIGS}/ExitEnv/env_lidar.json")
    assert env.functional.obs_type == "lidar"
    obs, _ = env.reset(seed=0)
    assert obs.shape == (16, 2)
    assert np.all(obs[:, 0] <= 1.0) and np.all(obs[:, 0] >= 0.0)


def test_six_feature_config_sizes_consistently():
    """A features list without presence/heading columns (e.g. parking's
    6-item list) must not declare an observation space the env never emits:
    sizing keys on heading presence, so emitted rows always match the
    declared space (code-review r4 finding)."""
    env = make({"observation": {"type": "Kinematics",
                                "features": ["x", "y", "vx", "vy",
                                             "cos_h", "sin_h"]},
                "vehicles_count": 6})
    obs, _ = env.reset(seed=0)
    assert obs.shape == env.functional.observation_space.shape
    env2 = make({"observation": {"type": "Kinematics",
                                 "features": ["presence", "x", "y", "vx", "vy"]},
                 "vehicles_count": 6})
    obs2, _ = env2.reset(seed=0)
    assert obs2.shape == (6, 5) == env2.functional.observation_space.shape


# ---------------------------------------------------------------------------
# TTC-grid finite-MDP view (reference: highway-env finite_mdp conversion)
# ---------------------------------------------------------------------------

def test_highway_to_finite_mdp_vi():
    """ValueIterationAgent plans on the TTC-grid MDP view
    (reference: HighwayEnv/agents/ValueIterationAgent/baseline.json +
    highway-env envs/common/finite_mdp.py)."""
    env = load_environment({"id": "highway", "vehicles_count": 8})
    obs, _ = env.reset(seed=0)
    view = env.to_finite_mdp()
    V, L, H = 3, 4, 10
    assert view.transition.shape == (V * L * H + 1, 5)
    assert bool(view.terminal[-1])        # absorbing crash state
    assert np.all(view.reward[-1] == 0.0)
    # FASTER from the top speed level stays at the top level
    top = ((V - 1) * L + 1) * H
    nxt = view.transition[top, 3]
    assert nxt // (L * H) == V - 1
    vi = load_agent({"__class__": "ValueIterationAgent", "gamma": 0.9,
                     "iterations": 60}, env)
    total, crashed = 0.0, False
    for _ in range(10):
        obs, r, term, trunc, info = env.step(vi.act(obs))
        total += float(r)
        crashed = bool(info["crashed"])
        if term or trunc:
            break
    assert not crashed and total > 7.0  # drives fast without crashing


def test_mcts_vi_prior_config():
    """The corpus's VI-prior MCTS loads and plans (the fused planner applies
    the tabular prior's root-state distribution at every node — documented
    approximation of the reference's per-node host calls)."""
    env = load_environment({"id": "highway", "vehicles_count": 8})
    obs, _ = env.reset(seed=0)
    agent = load_agent(
        f"{CONFIGS}/HighwayEnv/agents/MCTSWithPriorPolicyAgent/vi_prior.json", env)
    assert 0 <= int(agent.act(obs)) < 5
    assert float(jnp.sum(agent._root_prior)) == pytest.approx(1.0, abs=1e-5)
