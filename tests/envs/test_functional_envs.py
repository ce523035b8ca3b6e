import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.cartpole import CartPoleEnv
from rl_agents_tpu.envs.dynamics import DynamicsEnv
from rl_agents_tpu.envs.finite_mdp import FiniteMDPEnv, garnet, make as make_mdp, params_from_config
from rl_agents_tpu.envs.gridenv import GridEnv, LineEnv


def test_cartpole_matches_gymnasium():
    """Step-for-step parity against gymnasium CartPole-v0 physics."""
    import gymnasium as gym

    genv = gym.make("CartPole-v0").unwrapped
    genv.reset(seed=0)
    env = CartPoleEnv()
    params = env.default_params()
    # force same initial state
    state, _ = env.reset(params, jax.random.PRNGKey(0))
    genv.state = np.asarray([state.x, state.x_dot, state.theta, state.theta_dot], dtype=np.float64)

    key = jax.random.PRNGKey(1)
    for i in range(30):
        a = i % 2
        out = env.step(params, state, jnp.asarray(a), key)
        gobs, grew, gterm, gtrunc, _ = genv.step(a)
        np.testing.assert_allclose(np.asarray(out.obs), gobs, rtol=1e-4, atol=1e-5)
        assert float(out.reward) == grew
        assert bool(out.terminated) == gterm
        state = out.state
        if gterm:
            break


def test_cartpole_vmap_fork():
    env = CartPoleEnv()
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    states, obs = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    assert obs.shape == (64, 4)
    actions = jnp.zeros(64, jnp.int32)
    outs = jax.vmap(env.step, in_axes=(None, 0, 0, 0))(params, states, actions, keys)
    assert outs.reward.shape == (64,)


def test_finite_mdp_deterministic():
    handle = make_mdp({})
    obs, _ = handle.reset(seed=0)
    assert int(obs) == 0
    obs, r, term, trunc, _ = handle.step(1)
    assert int(obs) == 1 and r == 1.0


def test_finite_mdp_modes():
    env, params = garnet(jax.random.PRNGKey(0), 8, 3, branching=2)
    state, obs = env.reset(params, jax.random.PRNGKey(1))
    out = env.step(params, state, jnp.asarray(1), jax.random.PRNGKey(2))
    assert 0 <= int(out.obs) < 8

    env2, params2 = params_from_config({
        "mode": "stochastic",
        "transition": np.ones((2, 2, 2)) / 2,
        "reward": np.ones((2, 2)),
    })
    state2, _ = env2.reset(params2, jax.random.PRNGKey(0))
    out2 = env2.step(params2, state2, jnp.asarray(0), jax.random.PRNGKey(3))
    assert float(out2.reward) == 1.0


def test_gridenv_reward():
    env = GridEnv()
    params = env.default_params()
    state, obs = env.reset(params, jax.random.PRNGKey(0))
    # moving right+up towards (10,10) increases reward once inside radius
    key = jax.random.PRNGKey(0)
    for _ in range(10):
        out = env.step(params, state, jnp.asarray(0), key)  # +x
        state = out.state
        out = env.step(params, state, jnp.asarray(2), key)  # +y
        state = out.state
    np.testing.assert_allclose(np.asarray(state.x), [10, 10])
    assert float(out.reward) > 0.9


def test_lineenv_terminates():
    env = LineEnv()
    params = env.default_params()
    state, _ = env.reset(params, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    done = False
    for i in range(10):
        key, sub = jax.random.split(key)
        out = env.step(params, state, jnp.asarray(1), sub)
        state = out.state
        done = bool(out.terminated) or bool(out.truncated)
        if done:
            break
    assert abs(int(state.x)) <= 2


def test_dynamics_env():
    env = DynamicsEnv()
    params = env.default_params()
    state, obs = env.reset(params, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(obs), [-1.0, 0.0])
    out = env.step(params, state, jnp.asarray(1), jax.random.PRNGKey(0))
    assert float(out.reward) <= 1.0


def test_rollout_scan():
    env = CartPoleEnv()
    params = env.default_params()
    state, _ = env.reset(params, jax.random.PRNGKey(0))
    actions = jnp.zeros(16, jnp.int32)
    outs = env.rollout(params, state, actions, jax.random.PRNGKey(1))
    assert outs.reward.shape == (16,)
