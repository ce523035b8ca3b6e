"""Device-mesh utilities and sharded training/planning steps.

The reference's entire parallelism surface is process pools + model files on
disk (SURVEY §2.8; reference: trainer/evaluation.py:196-290,
scripts/experiments.py:105-106). The TPU-native equivalent is a single SPMD
program over a ``jax.sharding.Mesh``:

* ``dp`` axis — env/replay batch parallelism (actor-learner collection and
  Q-update minibatches sharded across chips; gradients psum-reduced by XLA)
* ``tp`` axis — wide-layer tensor parallelism for the Q-network matmuls
* tree batches for planners shard over ``dp`` as well (4096 parallel trees)

Weights stay resident in HBM; there is no file-based parameter channel.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rl_agents_tpu.ops.onehot import select_action_values


def make_mesh(n_devices: Optional[int] = None, axes: Sequence[str] = ("dp", "tp"),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over available devices. Default: all devices on ``dp``,
    one ``tp`` column (shape inferred as (n, 1) for two axes)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axes)


def shard_batch(mesh: Mesh, batch, axis="dp"):
    """Place a pytree batch with its leading axis sharded over ``axis``
    (a mesh axis name, or a tuple of names for multi-axis sharding, e.g.
    ``("host", "dp")`` on a pod mesh)."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def mlp_param_spec(params, tp_axis: str = "tp", mesh: Optional[Mesh] = None):
    """Tensor-parallel sharding for MLP pytrees: shard hidden (output) dim of
    kernels and biases over ``tp``; scalars/odd shapes replicated. Pass the
    target ``mesh`` to replicate any leaf whose sharded dim does not divide
    the tp axis (e.g. a small action head on a 2-way tp mesh)."""
    tp_size = int(mesh.shape[tp_axis]) if mesh is not None else None

    def divides(dim):
        return tp_size is None or dim % tp_size == 0

    def spec(path, x):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        if x.ndim == 2 and "kernel" in name and divides(x.shape[1]):
            return P(None, tp_axis)
        if x.ndim == 1 and "bias" in name and divides(x.shape[0]):
            return P(tp_axis)
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def make_sharded_train_step(mesh: Mesh, model, optimizer, gamma: float,
                            double: bool = True, tp: bool = True):
    """DQN train step sharded over the mesh: batch over every data axis of
    the mesh (``dp`` on a single-host mesh; ``("host", "dp")`` on a pod mesh,
    where the host axis rides DCN), params over ``tp`` (or replicated).
    XLA inserts the gradient psum across the data axes and the activation
    collectives across tp — no hand-written NCCL analog.

    Replaces the reference's worker-pool + model-file parameter channel
    (evaluation.py:196-290) with one SPMD program.
    """
    from rl_agents_tpu.parallel.distributed import data_axes
    batch_axes = data_axes(mesh)

    def loss_fn(params, target_params, batch):
        q = model.apply(params, batch.state)
        q_sa = select_action_values(q, batch.action)
        if double:
            best = jnp.argmax(model.apply(params, batch.next_state), axis=1)
            q_next = model.apply(target_params, batch.next_state)
            best_values = select_action_values(q_next, best)
        else:
            best_values = jnp.max(model.apply(target_params, batch.next_state), axis=1)
        target = batch.reward + gamma * jnp.where(batch.terminal, 0.0, best_values)
        return jnp.mean((q_sa - jax.lax.stop_gradient(target)) ** 2)

    def train_step(params, target_params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, target_params, batch)
        grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def param_shardings(params):
        if tp:
            return jax.tree.map(lambda s: NamedSharding(mesh, s), mlp_param_spec(params))
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), params)

    batch_sharding = NamedSharding(mesh, P(batch_axes))

    def compile_step(params, opt_state_example, batch_example):
        p_shard = param_shardings(params)
        o_shard = jax.tree.map(lambda _: NamedSharding(mesh, P()), opt_state_example)
        b_shard = jax.tree.map(
            lambda x: NamedSharding(mesh, P(batch_axes, *([None] * (x.ndim - 1)))),
            batch_example)
        return jax.jit(train_step,
                       in_shardings=(p_shard, p_shard, o_shard, b_shard),
                       out_shardings=(p_shard, o_shard, NamedSharding(mesh, P())))

    return train_step, compile_step, batch_sharding


def sharded_planner_batch(mesh: Mesh, plan_fn, params, states0, keys, axes=None):
    """Run a batch of independent trees sharded over the mesh's data axes via
    shard_map: each device plans its shard of trees locally; only the final
    stats gather crosses the interconnect (ICI within a host, DCN across the
    host axis of a pod mesh). The reference fans envs over process pools
    instead (SURVEY §2.8 P1/P2)."""
    from jax import shard_map

    from rl_agents_tpu.parallel.distributed import data_axes
    axes = tuple(axes) if axes is not None else data_axes(mesh)
    spec = P(axes)
    state_specs = jax.tree.map(lambda _: spec, states0)
    fn = shard_map(
        lambda s, k: jax.vmap(lambda si, ki: plan_fn(params, si, ki))(s, k),
        mesh=mesh,
        in_specs=(state_specs, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(states0, keys)
