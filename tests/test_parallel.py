"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rl_agents_tpu.agents.dqn.replay import Batch
from rl_agents_tpu.agents.tree_search.deterministic import opd_plan
from rl_agents_tpu.envs.cartpole import CartPoleEnv
from rl_agents_tpu.models import MultiLayerPerceptron
from rl_agents_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    mlp_param_spec,
    shard_batch,
    sharded_planner_batch,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8, axes=("dp", "tp"), shape=(4, 2))


def test_sharded_train_step(mesh):
    model = MultiLayerPerceptron(layers=(64, 64), out=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    batch = Batch(
        state=jnp.asarray(rng.random((16, 4)), jnp.float32),
        action=jnp.asarray(rng.integers(0, 2, 16), jnp.int32),
        reward=jnp.asarray(rng.random(16), jnp.float32),
        next_state=jnp.asarray(rng.random((16, 4)), jnp.float32),
        terminal=jnp.zeros(16, bool),
    )
    _, compile_step, _ = make_sharded_train_step(mesh, model, optimizer, gamma=0.99)
    step = compile_step(params, opt_state, batch)

    p_shard = jax.tree.map(lambda s: NamedSharding(mesh, s), mlp_param_spec(params))
    params = jax.device_put(params, p_shard)
    target = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state,
                               jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_state))
    batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))),
        batch)
    new_params, new_opt, loss = step(params, target, opt_state, batch)
    assert jnp.isfinite(loss)
    # params moved
    delta = jax.tree.leaves(jax.tree.map(lambda a, b: jnp.abs(a - b).max(),
                                         params, new_params))
    assert max(float(d) for d in delta) > 0


def test_sharded_planner_batch(mesh):
    """64 OPD trees sharded over the dp axis via shard_map."""
    env = CartPoleEnv(max_episode_steps=50)
    params = env.default_params()
    B = 64
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    def plan_one(params, state, key):
        actions, length, _ = opd_plan(env, params, state, key,
                                      num_actions=2, expansions=5, gamma=0.9,
                                      plan_capacity=8)
        return actions

    dp_mesh = make_mesh(8, axes=("dp",), shape=(8,))
    states0 = shard_batch(dp_mesh, states0)
    keys = shard_batch(dp_mesh, keys)
    actions = sharded_planner_batch(dp_mesh, plan_one, params, states0, keys)
    assert actions.shape == (B, 8)
    assert np.all(np.asarray(actions) < 2)


def test_fused_actor_learner_sharded(mesh):
    """The fused actor-learner segment runs SPMD: env batch + replay sharded
    over dp, params replicated; XLA inserts the gradient reduction."""
    import optax

    from rl_agents_tpu.parallel.actor_learner import make_actor_learner

    env = CartPoleEnv(max_episode_steps=50)
    model = MultiLayerPerceptron(layers=(32, 32), out=2)
    dp_mesh = make_mesh(8, axes=("dp",), shape=(8,))
    init_fn, segment_fn = make_actor_learner(env, model, optax.adam(1e-3),
                                             num_envs=16, capacity=1024, batch_size=32)
    state = init_fn(jax.random.PRNGKey(0))
    # shard env batch and replay over dp; everything else replicated
    state = state._replace(
        env_states=jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(dp_mesh, P("dp", *([None] * (x.ndim - 1))))),
            state.env_states),
        obs=jax.device_put(state.obs, NamedSharding(dp_mesh, P("dp", None))),
        buffer=jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(dp_mesh, P("dp", *([None] * (x.ndim - 1))))),
            state.buffer),
    )
    state, mean_reward = segment_fn(state, steps=20)
    jax.block_until_ready(state.params)
    assert np.isfinite(float(mean_reward))
    assert int(state.size) == min(20 * 16, 1024)
