"""Orbax checkpoint store: sharded round-trips, retention, agent wiring.

TPU-native checkpointing per SURVEY §5 ("orbax-style array checkpoints of
params+opt-state+replay+PRNG state"), replacing the reference's torch .tar
files (reference: trainer/evaluation.py:292-323)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.trainer.checkpoint import (OrbaxCheckpointStore,
                                              load_pytree, save_pytree)


def _sharded_tree():
    devices = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devices), ("dp",))
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp"))
    replicated = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    return {
        "params": jax.device_put(jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16),
                                 sharding),
        "opt_state": {"mu": jax.device_put(jnp.ones((8, 4)), sharding),
                      "count": jax.device_put(jnp.int32(7), replicated)},
        "key": jax.random.PRNGKey(3),
    }


def test_orbax_roundtrip_preserves_values_and_sharding(tmp_path):
    tree = _sharded_tree()
    store = OrbaxCheckpointStore(tmp_path / "ckpt")
    store.save(0, tree)
    restored = store.restore(template=tree)
    store.close()
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored["params"].sharding == tree["params"].sharding
    assert len(restored["params"].sharding.device_set) == len(jax.devices())


def test_orbax_retention_keeps_last_k(tmp_path):
    store = OrbaxCheckpointStore(tmp_path / "ckpt", max_to_keep=3)
    tree = {"w": jnp.zeros(4)}
    for step in range(6):
        store.save(step, {"w": jnp.full(4, float(step))})
    assert store.all_steps() == [3, 4, 5]
    assert store.latest_step() == 5
    latest = store.restore(template=tree)
    store.close()
    np.testing.assert_array_equal(np.asarray(latest["w"]), np.full(4, 5.0))


def test_save_load_pytree_one_shot(tmp_path):
    tree = _sharded_tree()
    save_pytree(tmp_path / "one", tree)
    restored = load_pytree(tmp_path / "one", template=tree)
    np.testing.assert_array_equal(np.asarray(restored["params"]),
                                  np.asarray(tree["params"]))


def test_save_pytree_overwrites(tmp_path):
    """Re-saving to the same path must replace the checkpoint (orbax skips
    an existing step silently — the harness writes latest.* every cadence)."""
    save_pytree(tmp_path / "latest", {"w": jnp.zeros(3)})
    save_pytree(tmp_path / "latest", {"w": jnp.full(3, 9.0)})
    restored = load_pytree(tmp_path / "latest", template={"w": jnp.zeros(3)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(3, 9.0))


def test_dqn_orbax_save_load(tmp_path):
    from rl_agents_tpu.agents.dqn.agent import DQNAgent
    from rl_agents_tpu.envs.cartpole import make as make_cartpole

    env = make_cartpole({})
    config = {"model": {"type": "MultiLayerPerceptron", "layers": [8]},
              "checkpoint_format": "orbax"}
    agent = DQNAgent(env, config)
    q_before = agent.get_state_action_values(np.ones(4))
    path = agent.save(tmp_path / "model.tar")
    assert path.suffix == ".orbax" and path.is_dir()
    agent2 = DQNAgent(env, config)
    agent2.load(path)
    np.testing.assert_allclose(agent2.get_state_action_values(np.ones(4)),
                               q_before, atol=1e-6)
