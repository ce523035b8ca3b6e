"""Multi-host (pod) topology tests on the 8-device virtual CPU mesh.

The driver provides 8 virtual devices (conftest); these tests emulate a
2-host x 4-chip pod: the outer mesh axis stands for DCN between hosts, the
inner axes for ICI. Correctness is asserted against single-device ground
truth, i.e. the gradient psum over the host axis and the planner-stat gather
must be exact. (Replaces the reference's multi-process scale-out,
reference: trainer/evaluation.py:196-290.)
"""
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
from rl_agents_tpu.parallel.distributed import (
    data_axes,
    make_pod_mesh,
    maybe_initialize_distributed,
)
from rl_agents_tpu.parallel.mesh import (
    make_sharded_train_step,
    mlp_param_spec,
    shard_batch,
    sharded_planner_batch,
)


def test_pod_mesh_topology():
    mesh = make_pod_mesh(axes=("host", "dp"), hosts=2)
    assert mesh.axis_names == ("host", "dp")
    assert dict(mesh.shape) == {"host": 2, "dp": 4}
    mesh3 = make_pod_mesh(axes=("host", "dp", "tp"), hosts=2, local_shape=(2, 2))
    assert dict(mesh3.shape) == {"host": 2, "dp": 2, "tp": 2}
    assert data_axes(mesh3) == ("host", "dp")
    # host axis must walk contiguous device groups (process-major order)
    devs = mesh.devices
    flat = [d.id for d in devs.reshape(-1)]
    assert flat == sorted(flat)


def test_pod_mesh_errors():
    with pytest.raises(ValueError):
        make_pod_mesh(axes=("host", "dp"), hosts=3)  # 8 % 3 != 0
    with pytest.raises(ValueError):
        make_pod_mesh(axes=("host", "dp", "tp"), hosts=2, local_shape=(3, 1))


def test_maybe_initialize_distributed_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_COUNT", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert maybe_initialize_distributed() is False


def _example_batch(n=16, obs_dim=4, num_actions=2, seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        state=jnp.asarray(rng.random((n, obs_dim)), jnp.float32),
        action=jnp.asarray(rng.integers(0, num_actions, n), jnp.int32),
        reward=jnp.asarray(rng.random(n), jnp.float32),
        next_state=jnp.asarray(rng.random((n, obs_dim)), jnp.float32),
        terminal=jnp.zeros(n, bool),
    )


def test_gradient_psum_across_host_axis():
    """One sharded train step on a (host=2, dp=2, tp=2) pod mesh must produce
    the same updated params as the unsharded step on the full batch — i.e.
    the gradient reduction over DCN (host) + ICI (dp) axes is exact."""
    mesh = make_pod_mesh(axes=("host", "dp", "tp"), hosts=2, local_shape=(2, 2))
    model = MultiLayerPerceptron(layers=(32, 32), out=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    batch = _example_batch()

    train_step, compile_step, _ = make_sharded_train_step(
        mesh, model, optimizer, gamma=0.99)
    step = compile_step(params, opt_state, batch)

    p_shard = jax.tree.map(lambda s: NamedSharding(mesh, s), mlp_param_spec(params))
    sp = jax.device_put(params, p_shard)
    st = jax.device_put(params, p_shard)
    so = jax.device_put(opt_state,
                        jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_state))
    sb = jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(("host", "dp"), *([None] * (x.ndim - 1))))),
        batch)
    sharded_params, _, sharded_loss = step(sp, st, so, sb)

    ref_params, _, ref_loss = jax.jit(train_step)(params, params, opt_state, batch)
    assert np.isclose(float(sharded_loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(sharded_params), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_planner_gather_across_host_axis():
    """OPD tree batch sharded over ('host','dp') must match plain vmap —
    the per-tree programs are independent; the only cross-device traffic is
    the output gather, which must be a pure re-layout."""
    env = CartPoleEnv(max_episode_steps=50)
    params = env.default_params()
    B = 32
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    def plan_one(p, s, k):
        actions, _, _ = opd_plan(env, p, s, k, num_actions=2, expansions=5,
                                 gamma=0.9, plan_capacity=8)
        return actions

    expected = jax.vmap(lambda s, k: plan_one(params, s, k))(states0, keys)

    mesh = make_pod_mesh(axes=("host", "dp"), hosts=2)
    sharded_states = shard_batch(mesh, states0, axis=("host", "dp"))
    sharded_keys = shard_batch(mesh, keys, axis=("host", "dp"))
    actions = sharded_planner_batch(mesh, plan_one, params,
                                    sharded_states, sharded_keys)
    np.testing.assert_array_equal(np.asarray(actions), np.asarray(expected))


def _fused_setup(mesh, **overrides):
    from rl_agents_tpu.parallel.actor_learner import make_sharded_actor_learner

    kwargs = dict(num_shards=8, envs_per_shard=4, capacity=256, batch_size=8,
                  learning_starts=32, eps_tau=100.0, target_update=4)
    kwargs.update(overrides)
    env = CartPoleEnv(max_episode_steps=50)
    model = MultiLayerPerceptron(layers=(16, 16), out=2)
    return make_sharded_actor_learner(env, model, optax.adam(1e-3), mesh, **kwargs)


def test_fused_actor_learner_pod_matches_single_device():
    """The fused collect→replay→update segment sharded over the (host, dp)
    pod mesh must produce the same learning trace as the identical program on
    one device: the shard axis is device-count invariant by construction, so
    the only difference is the psum reduction order (float tolerance).
    This is the end-to-end P2 check the synthetic SGD-step test lacked
    (reference: trainer/evaluation.py:196-290)."""
    pod = make_pod_mesh(axes=("host", "dp"), hosts=2)
    single = make_pod_mesh(axes=("host", "dp"), hosts=1,
                           devices=jax.devices()[:1])

    traces, finals = [], []
    for mesh in (pod, single):
        init_fn, segment_fn, _ = _fused_setup(mesh)
        state = init_fn(jax.random.PRNGKey(0))
        trace = []
        for _ in range(3):
            state, mean_reward = segment_fn(state, steps=30)
            trace.append(float(mean_reward))
        traces.append(trace)
        finals.append(state)

    np.testing.assert_allclose(traces[0], traces[1], rtol=1e-4, atol=1e-5)
    # params took >0 updates and agree across layouts
    assert int(finals[0].time) == 90 and int(finals[0].size) > 32
    for a, b in zip(jax.tree.leaves(finals[0].params),
                    jax.tree.leaves(finals[1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)
    # the EMA return bookkeeping (a cross-shard reduction) agrees too
    np.testing.assert_allclose(float(finals[0].completed_return),
                               float(finals[1].completed_return),
                               rtol=1e-4, atol=1e-5)


def test_fused_actor_learner_sharding_layout():
    """Replay/env leaves actually shard over (host, dp); params replicate."""
    pod = make_pod_mesh(axes=("host", "dp"), hosts=2)
    init_fn, segment_fn, shardings_fn = _fused_setup(pod)
    state = init_fn(jax.random.PRNGKey(1))
    state, _ = segment_fn(state, steps=5)
    assert state.buffer.state.sharding.spec[0] == ("host", "dp")
    assert state.obs.sharding.spec[0] == ("host", "dp")
    for leaf in jax.tree.leaves(state.params):
        assert leaf.sharding.is_fully_replicated
    # shardings_fn reproduces the layout (checkpoint template contract)
    specs = shardings_fn(state)
    assert specs.buffer.state.is_equivalent_to(state.buffer.state.sharding, state.buffer.state.ndim)


def test_fused_actor_learner_checkpoint_under_pod_mesh(tmp_path):
    """Orbax save/restore of the full sharded train state inside a training
    run: restore preserves the (host, dp) layout and resuming from the
    checkpoint continues exactly as the uninterrupted run."""
    from rl_agents_tpu.trainer.checkpoint import load_pytree, save_pytree

    pod = make_pod_mesh(axes=("host", "dp"), hosts=2)
    init_fn, segment_fn, shardings_fn = _fused_setup(pod)
    state = init_fn(jax.random.PRNGKey(2))
    state, _ = segment_fn(state, steps=20)

    save_pytree(tmp_path / "fused.ckpt", state)
    template = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state, shardings_fn(state))
    restored = load_pytree(tmp_path / "fused.ckpt", template=template)
    assert restored.buffer.state.sharding.spec[0] == ("host", "dp")

    cont_a, ra = segment_fn(state, steps=10)
    cont_b, rb = segment_fn(restored, steps=10)
    np.testing.assert_allclose(float(ra), float(rb), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(cont_a.params), jax.tree.leaves(cont_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_fused_actor_learner_flagship_highway():
    """The FLAGSHIP configuration under the pod mesh: EgoAttentionNetwork
    learner on the functional highway env, env batch + replay sharded over
    (host, dp) — the BASELINE configs 4-5 recipe running as one SPMD
    program (reference: scripts/configs/HighwayEnv/agents/DQNAgent/
    ego_attention.json + trainer/evaluation.py:196-290)."""
    from rl_agents_tpu.envs.highway import HighwayEnv
    from rl_agents_tpu.models import EgoAttentionNetwork
    from rl_agents_tpu.parallel.actor_learner import make_sharded_actor_learner

    pod = make_pod_mesh(axes=("host", "dp"), hosts=2)
    env = HighwayEnv(vehicles=6, lanes=3, max_episode_steps=20)
    model = EgoAttentionNetwork(out=5, embedding_layers=(16,),
                                others_embedding_layers=(16,),
                                output_layers=(16,), feature_size=16, heads=2)
    init_fn, segment_fn, _ = make_sharded_actor_learner(
        env, model, optax.adam(5e-4), pod, num_shards=8, envs_per_shard=2,
        capacity=64, batch_size=4, learning_starts=8)
    state = init_fn(jax.random.PRNGKey(7))
    assert state.obs.shape == (8, 2, 6, 5)
    state, mean_reward = segment_fn(state, steps=10)
    assert np.isfinite(float(mean_reward))
    assert int(state.time) == 10 and int(state.size) == 20
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    assert state.buffer.state.sharding.spec[0] == ("host", "dp")


def test_fused_actor_learner_tp_params():
    """With tp=True on a (host, dp, tp) mesh the Q-network kernels shard
    their hidden dim over tp while the data axes still carry the env batch —
    dp x tp composed in ONE fused segment."""
    mesh = make_pod_mesh(axes=("host", "dp", "tp"), hosts=2, local_shape=(2, 2))
    init_fn, segment_fn, _ = _fused_setup(mesh, num_shards=4, tp=True)
    state = init_fn(jax.random.PRNGKey(3))
    kernel = state.params["params"]["Dense_0"]["kernel"]
    assert kernel.sharding.spec == P(None, "tp")
    state, mean_reward = segment_fn(state, steps=10)
    assert np.isfinite(float(mean_reward))
    assert state.params["params"]["Dense_0"]["kernel"].sharding.spec == P(None, "tp")


def test_cross_host_collective_mean():
    """An explicit psum over both data axes of the pod mesh computes the
    exact global mean (the stat-reduction pattern the trainer uses)."""
    from jax import shard_map

    mesh = make_pod_mesh(axes=("host", "dp"), hosts=2)
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)

    def local_mean(xs):
        s = jax.lax.psum(jnp.sum(xs), axis_name=("host", "dp"))
        n = jax.lax.psum(jnp.asarray(xs.size, jnp.float32), ("host", "dp"))
        return (s / n)[None]

    fn = shard_map(local_mean, mesh=mesh,
                   in_specs=P(("host", "dp")), out_specs=P(("host", "dp")))
    out = fn(x)
    np.testing.assert_allclose(np.asarray(out), float(x.mean()), rtol=1e-6)


def test_fused_actor_learner_flagship_tp():
    """Flagship EgoAttentionNetwork with tensor-parallel kernels on a
    (host, dp, tp) pod mesh: attention/embedding Dense hidden dims shard
    over tp while the env batch rides (host, dp) — dp x tp on the flagship
    in ONE fused segment."""
    from rl_agents_tpu.envs.highway import HighwayEnv
    from rl_agents_tpu.models import EgoAttentionNetwork
    from rl_agents_tpu.parallel.actor_learner import make_sharded_actor_learner

    mesh = make_pod_mesh(axes=("host", "dp", "tp"), hosts=2, local_shape=(2, 2))
    env = HighwayEnv(vehicles=6, lanes=3, max_episode_steps=20)
    model = EgoAttentionNetwork(out=5, embedding_layers=(16,),
                                others_embedding_layers=(16,),
                                output_layers=(16,), feature_size=16, heads=2)
    init_fn, segment_fn, _ = make_sharded_actor_learner(
        env, model, optax.adam(5e-4), mesh, num_shards=4, envs_per_shard=2,
        capacity=64, batch_size=4, learning_starts=8, tp=True)
    state = init_fn(jax.random.PRNGKey(11))
    # at least one 2-D kernel actually sharded over tp
    specs = [leaf.sharding.spec for leaf in jax.tree.leaves(state.params)
             if getattr(leaf, "ndim", 0) == 2]
    assert any("tp" in str(s) for s in specs), specs
    state, mean_reward = segment_fn(state, steps=8)
    assert np.isfinite(float(mean_reward))
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
