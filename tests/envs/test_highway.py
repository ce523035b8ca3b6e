import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.deterministic import DeterministicPlannerAgent
from rl_agents_tpu.agents.tree_search.mcts import MCTSAgent
from rl_agents_tpu.envs.highway import IDLE, make, make_intersection
from rl_agents_tpu.models import model_factory


def test_highway_obs_format():
    env = make({"vehicles_count": 10, "lanes_count": 3})
    obs, _ = env.reset(seed=0)
    assert obs.shape == (10, 5)
    assert obs[0, 0] == 1.0  # ego present
    assert np.all(obs >= -1) and np.all(obs <= 1)


def test_highway_idle_rollout():
    env = make({"vehicles_count": 8})
    env.reset(seed=1)
    total, crashed = 0.0, False
    for _ in range(20):
        obs, r, done, trunc, info = env.step(IDLE)
        total += r
        crashed = bool(info["crashed"])
        if done or trunc:
            break
    assert total > 0
    assert np.isfinite(total)


def test_highway_vmap_batch():
    env = make({"vehicles_count": 8})
    f, params = env.functional, env.params
    B = 256
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, obs = jax.vmap(f.reset, in_axes=(None, 0))(params, keys)
    outs = jax.vmap(f.step, in_axes=(None, 0, 0, 0))(
        params, states, jnp.ones(B, jnp.int32), keys)
    assert outs.reward.shape == (B,)


def test_highway_crash_on_rear_end():
    """Forcing FASTER into slower traffic should eventually crash the ego."""
    env = make({"vehicles_count": 15, "lanes_count": 1, "max_episode_steps": 60})
    env.reset(seed=3)
    crashed = False
    for _ in range(60):
        obs, r, done, trunc, info = env.step(3)  # FASTER, single lane
        if info["crashed"]:
            crashed = True
            break
        if done or trunc:
            break
    assert crashed


def test_mcts_plans_on_highway():
    env = make({"vehicles_count": 8, "max_episode_steps": 20})
    agent = MCTSAgent(env, {"budget": 150, "gamma": 0.9})
    agent.seed(0)
    obs, _ = env.reset(seed=0)
    total = 0.0
    done = trunc = False
    while not (done or trunc):
        action = agent.act(obs)
        obs, r, done, trunc, info = env.step(action)
        total += r
    assert not bool(info["crashed"])  # planner avoids collisions


def test_opd_plans_on_highway():
    env = make({"vehicles_count": 8, "max_episode_steps": 15})
    agent = DeterministicPlannerAgent(env, {"budget": 75, "gamma": 0.9})
    agent.seed(0)
    obs, _ = env.reset(seed=0)
    action = agent.act(obs)
    assert action in range(5)


def test_ego_attention_consumes_highway_obs():
    env = make({"vehicles_count": 10})
    obs, _ = env.reset(seed=0)
    config = {"type": "EgoAttentionNetwork", "out": 5,
              "embedding_layer": {"layers": [32, 32]},
              "others_embedding_layer": {"layers": [32, 32]},
              "attention_layer": {"feature_size": 32, "heads": 2},
              "output_layer": {"layers": [32]}}
    model = model_factory(config)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(obs)[None])
    q = model.apply(params, jnp.asarray(obs)[None])
    assert q.shape == (1, 5)


def test_intersection_env():
    env = make_intersection({"vehicles_count": 6})
    obs, _ = env.reset(seed=0)
    assert obs.shape == (6, 5)
    total = 0.0
    for _ in range(26):
        obs, r, done, trunc, info = env.step(1)
        total += r
        if done or trunc:
            break
    assert np.isfinite(total)


def test_intersection_arrival_reward():
    """Driving FASTER through an empty intersection should arrive (reward 1)."""
    env = make_intersection({"vehicles_count": 1})  # ego only
    env.reset(seed=0)
    rewards = []
    for _ in range(26):
        obs, r, done, trunc, info = env.step(2)
        rewards.append(r)
        if done or trunc:
            break
    assert rewards[-1] == 1.0  # arrived


def test_simplify_preprocessor():
    """env_preprocessors [{"method": "simplify"}] shrinks the planning model
    (reference factory.py:97-116 + highway-env simplify)."""
    from rl_agents_tpu.factory import preprocess_env

    env = make({"vehicles_count": 15})
    env.reset(seed=0)
    simplified = preprocess_env(env, [{"method": "simplify", "args": [6]}])
    assert simplified.functional.vehicles == 6
    assert simplified.state.x.shape == (6,)
    # ego preserved as vehicle 0
    np.testing.assert_allclose(float(simplified.state.x[0]), float(env.state.x[0]))
    # planning on the simplified env works
    agent = DeterministicPlannerAgent(simplified, {"budget": 30, "gamma": 0.9})
    agent.seed(0)
    assert agent.act(None) in range(5)


def test_planner_agent_with_simplify_config():
    env = make({"vehicles_count": 12, "max_episode_steps": 10})
    agent = MCTSAgent(env, {"budget": 80, "gamma": 0.9,
                            "env_preprocessors": [{"method": "simplify", "args": [5]}]})
    agent.seed(0)
    obs, _ = env.reset(seed=0)
    assert agent.act(obs) in range(5)


def _state(env, x, lane, speed):
    from rl_agents_tpu.envs.highway import HighwayState

    V = env.vehicles
    assert len(x) == V
    return HighwayState(
        x=jnp.asarray(x, jnp.float32),
        lane=jnp.asarray(lane, jnp.float32),
        target_lane=jnp.asarray(lane, jnp.int32),
        speed=jnp.asarray(speed, jnp.float32),
        speed_level=jnp.int32(1),
        alive=jnp.ones((V,), bool),
        crashed=jnp.zeros((), bool),
        t=jnp.zeros((), jnp.int32))


def test_mobil_overtakes_slow_leader():
    """A traffic vehicle blocked behind a slow leader with a free adjacent
    lane changes lanes (highway-env behavior.py IDMVehicle.mobil)."""
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=3, lanes=3)
    params = env.default_params()
    # ego parked far behind; vehicle 1 doing 25 m/s blocked by vehicle 2 at
    # 5 m/s just ahead in the same lane
    state = _state(env, x=[-500.0, 0.0, 18.0], lane=[0, 1, 1],
                   speed=[0.0, 25.0, 5.0])
    key = jax.random.PRNGKey(0)
    out = env.transition(params, state, jnp.int32(IDLE), key)
    assert int(out.state.target_lane[1]) != 1  # moved off the blocked lane
    assert int(out.state.target_lane[2]) == 1  # the slow leader has no gain
    # and the lateral pull actually moves it over the following steps
    s = out.state
    for _ in range(3):
        s = env.transition(params, s, jnp.int32(IDLE), key).state
    assert abs(float(s.lane[1]) - float(s.target_lane[1])) < 1e-5


def test_mobil_blocked_by_unsafe_follower():
    """No lane change when it would brake the new follower beyond b_safe."""
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=4, lanes=2)
    params = env.default_params()
    # vehicle 1 blocked in lane 1; lane 0 has a fast vehicle 3 right behind
    # the merge point -> unsafe
    state = _state(env, x=[-500.0, 0.0, 18.0, -3.0], lane=[0, 1, 1, 0],
                   speed=[0.0, 25.0, 5.0, 35.0])
    out = env.transition(params, state, jnp.int32(IDLE), jax.random.PRNGKey(0))
    assert int(out.state.target_lane[1]) == 1  # stayed


def test_mobil_never_moves_ego():
    """The ego's lateral moves are meta-actions only; MOBIL must not touch
    lane 0's target even when the ego is blocked."""
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=2, lanes=3)
    params = env.default_params()
    state = _state(env, x=[0.0, 15.0], lane=[1, 1], speed=[25.0, 3.0])
    out = env.transition(params, state, jnp.int32(IDLE), jax.random.PRNGKey(0))
    assert int(out.state.target_lane[0]) == 1
