"""Fused on-device actor-learner for value-based training.

The reference's training loop crosses the host on every env step (act ->
gym step -> record -> torch SGD; reference: deep_q_network/abstract.py:37-83)
and scales by respawning agents in worker processes with model files as the
parameter channel (trainer/evaluation.py:196-290). Here the entire loop is
one jitted program: E vectorised envs act with epsilon-greedy Q-policies,
write transitions into a device replay ring, and a DQN update runs per step —
scanned over K steps per segment with zero host round-trips. Multi-chip: the
env/replay batch shards over the mesh's dp axis and XLA psums the gradients.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from rl_agents_tpu.agents.dqn.replay import Batch, n_step_collapse
from rl_agents_tpu.envs.base import FunctionalEnv
from rl_agents_tpu.ops.onehot import select_action_values


class ActorLearnerState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any
    buffer: Batch          # capacity-C device replay ring
    position: Any          # [] i32
    size: Any              # [] i32
    env_states: Any        # E-batched env states
    obs: Any               # [E, ...]
    episode_return: Any    # [E] running returns
    completed_return: Any  # [] EMA of completed episode returns
    completed_count: Any   # [] i32
    time: Any              # [] i32 exploration time
    key: Any


def make_actor_learner(env: FunctionalEnv, model, optimizer,
                       num_envs: int = 16, capacity: int = 50_000,
                       batch_size: int = 100, gamma: float = 0.99,
                       double: bool = True, target_update: int = 1,
                       eps_init: float = 1.0, eps_final: float = 0.1,
                       eps_tau: float = 5000.0, learning_starts: int = 200,
                       n_steps: int = 1, updates_per_step: int = 1,
                       sample_mode: str = "uniform"):
    """Build (init_fn, segment_fn) where segment_fn runs K fused steps.
    ``n_steps > 1`` collapses n consecutive same-env transitions per sample
    (stride-E in the interleaved ring; reference: memory.py:58-77).
    ``updates_per_step > 1`` runs that many SGD updates (fresh minibatch
    each) per collected env-step batch — the throughput-optimal regime that
    keeps the MXU fed when the env batch is large.

    ``sample_mode="slices"`` (requires ``batch_size % num_envs == 0`` and
    ``n_steps == 1``) samples whole random time-slices of the interleaved
    ring (batch_size/E random steps x all E envs) via dynamic slices instead
    of a random row gather. Each transition keeps the uniform marginal and
    co-sampled rows come from INDEPENDENT envs, so the estimator stays
    unbiased — while the gather (measured ~2 ms per 16k-row minibatch on the
    v5e, ~2/3 of an update) becomes ~free."""
    E = num_envs
    if sample_mode not in ("uniform", "slices"):
        raise ValueError(f"Unknown sample_mode {sample_mode}")
    if sample_mode == "slices" and (batch_size % E != 0 or n_steps != 1
                                    or capacity % E != 0):
        # a misaligned ring wraps writes mid-block, so an E-aligned read
        # would mix two write steps (same env twice) and bias the tail rows
        raise ValueError("slices sampling needs batch_size % num_envs == 0, "
                         "capacity % num_envs == 0 and n_steps == 1")
    contiguous_ring = capacity % E == 0
    obs_shape = env.observation_space.shape

    def init_fn(key):
        key, kp, ke = jax.random.split(key, 3)
        dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.float32)
        params = model.init(kp, dummy)
        env_states, obs = jax.vmap(env.reset, in_axes=(None, 0))(
            env.default_params(), jax.random.split(ke, E))
        buffer = Batch(
            state=jnp.zeros((capacity,) + tuple(obs_shape), jnp.float32),
            action=jnp.zeros((capacity,), jnp.int32),
            reward=jnp.zeros((capacity,), jnp.float32),
            next_state=jnp.zeros((capacity,) + tuple(obs_shape), jnp.float32),
            terminal=jnp.zeros((capacity,), bool),
        )
        # distinct target buffers: the segment donates its input state, and a
        # donated buffer must not be aliased across two arguments
        return ActorLearnerState(
            params=params, target_params=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            buffer=buffer, position=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32),
            env_states=env_states, obs=obs.astype(jnp.float32),
            episode_return=jnp.zeros((E,)),
            completed_return=jnp.zeros(()), completed_count=jnp.zeros((), jnp.int32),
            time=jnp.zeros((), jnp.int32), key=key)

    def loss_fn(params, target_params, batch: Batch):
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

    def one_step(state: ActorLearnerState, _):
        key, ka, ks, kr, kb = jax.random.split(state.key, 5)
        params_env = env.default_params()

        # ---- act: epsilon-greedy over Q ------------------------------
        eps = eps_final + (eps_init - eps_final) * jnp.exp(
            -state.time.astype(jnp.float32) / eps_tau)
        q = model.apply(state.params, state.obs)
        greedy = jnp.argmax(q, axis=1)
        random_actions = jax.random.randint(ka, (E,), 0, q.shape[1])
        explore = jax.random.uniform(kr, (E,)) < eps
        actions = jnp.where(explore, random_actions, greedy)

        # ---- env step (vectorised), auto-reset -----------------------
        outs = jax.vmap(env.step, in_axes=(None, 0, 0, 0))(
            params_env, state.env_states, actions, jax.random.split(ks, E))
        done = outs.terminated | outs.truncated
        reset_states, reset_obs = jax.vmap(env.reset, in_axes=(None, 0))(
            params_env, jax.random.split(kb, E))
        env_states = jax.tree.map(
            lambda n, r: jnp.where(done.reshape((E,) + (1,) * (n.ndim - 1)), r, n),
            outs.state, reset_states)
        next_obs = jnp.where(done[:, None] if outs.obs.ndim == 2
                             else done.reshape((E,) + (1,) * (outs.obs.ndim - 1)),
                             reset_obs, outs.obs).astype(jnp.float32)

        # episode-return bookkeeping
        episode_return = state.episode_return + outs.reward
        finished = jnp.sum(done.astype(jnp.int32))
        mean_finished = jnp.sum(jnp.where(done, episode_return, 0.0)) / jnp.maximum(finished, 1)
        completed_return = jnp.where(
            finished > 0,
            0.95 * state.completed_return + 0.05 * mean_finished,
            state.completed_return)
        episode_return = jnp.where(done, 0.0, episode_return)

        # ---- replay write (E rows) -----------------------------------
        if contiguous_ring:
            # capacity % E == 0: the E-row block never wraps, so the write is
            # ONE dynamic_update_slice — .at[idx].set with an index vector is
            # a scatter, ~ms-scale per step on TPU (docs/onehot.md)
            def put(arr, rows):
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, rows.astype(arr.dtype), state.position, axis=0)
        else:
            idx = (state.position + jnp.arange(E)) % capacity

            def put(arr, rows):
                return arr.at[idx].set(rows.astype(arr.dtype))

        buffer = Batch(
            state=put(state.buffer.state, state.obs),
            action=put(state.buffer.action, actions),
            reward=put(state.buffer.reward, outs.reward),
            next_state=put(state.buffer.next_state, outs.obs.astype(jnp.float32)),
            terminal=put(state.buffer.terminal, outs.terminated),
        )
        position = (state.position + E) % capacity
        size = jnp.minimum(state.size + E, capacity)

        # ---- learner update(s) ---------------------------------------
        key, km = jax.random.split(key)

        def grad_update(params, opt_state, minibatch):
            grads = jax.grad(loss_fn)(params, state.target_params, minibatch)
            grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        def sample_minibatch(ku):
            if sample_mode == "slices":
                # K whole time-slices (E independent envs each): K dynamic
                # slices instead of a batch_size random-row gather
                K = batch_size // E
                steps_avail = jnp.maximum(size // E, 1)
                starts = jax.random.randint(ku, (K,), 0, steps_avail) * E

                def take(arr):
                    return jnp.concatenate(
                        [jax.lax.dynamic_slice_in_dim(arr, starts[k], E, axis=0)
                         for k in range(K)])

                return jax.tree.map(take, buffer)
            sample_idx = jax.random.randint(ku, (batch_size,), 0,
                                            jnp.maximum(size, 1))
            if n_steps == 1:
                return jax.tree.map(lambda x: x[sample_idx], buffer)
            return n_step_collapse(buffer, sample_idx, jnp.maximum(size, 1),
                                   n_steps, jnp.float32(gamma), stride=E)

        if updates_per_step == 1:
            def do_update(args):
                return grad_update(*args, sample_minibatch(km))
        else:
            # PRESAMPLED + UNROLLED: minibatches are sampled up front (they
            # never depend on the param chain) and the update chain is
            # straight-line HLO rather than a nested lax.scan — a scan
            # nested inside the segment scan costs ~0.28 ms of scheduling
            # overhead per inner iteration on the v5e (r5, docs/onehot.md).
            # Note the measured residual: XLA still schedules ~0.22 ms of
            # data movement per in-segment update regardless of whether the
            # takes are written before or interleaved with the chain (the
            # dependency graph is identical); see the docs note.
            # updates_per_step is static and small, so straight-line HLO
            # costs only compile time.
            def do_update(args):
                kus = jax.random.split(km, updates_per_step)
                batches = [sample_minibatch(kus[i])
                           for i in range(updates_per_step)]
                params, opt_state = args
                for mb in batches:
                    params, opt_state = grad_update(params, opt_state, mb)
                return params, opt_state

        can_train = size >= jnp.maximum(batch_size, learning_starts)
        # masked select instead of lax.cond: a cond nested in the segment
        # scan re-imposes the ~0.3 ms/update nested-region scheduling
        # overhead the unrolled update loop just removed (r5 bisection).
        # The update runs unconditionally and is discarded until the ring
        # fills — identical visible semantics, a few wasted warm-up updates.
        new_params, new_opt = do_update((state.params, state.opt_state))
        params = jax.tree.map(lambda n, o: jnp.where(can_train, n, o),
                              new_params, state.params)
        opt_state = jax.tree.map(lambda n, o: jnp.where(can_train, n, o),
                                 new_opt, state.opt_state)
        time = state.time + 1
        target_params = jax.tree.map(
            lambda p, t: jnp.where(time % target_update == 0, p, t),
            params, state.target_params)

        new_state = ActorLearnerState(
            params=params, target_params=target_params, opt_state=opt_state,
            buffer=buffer, position=position, size=size,
            env_states=env_states, obs=next_obs,
            episode_return=episode_return, completed_return=completed_return,
            completed_count=state.completed_count + finished,
            time=time, key=key)
        return new_state, outs.reward.mean()

    @partial(jax.jit, static_argnames=("steps",), donate_argnums=(0,))
    def segment_fn(state: ActorLearnerState, steps: int = 100):
        state, rewards = jax.lax.scan(one_step, state, None, length=steps)
        return state, rewards.mean()

    return init_fn, segment_fn


class ShardedActorLearnerState(NamedTuple):
    """Fused train state with an explicit leading shard axis ``S``.

    The shard axis maps onto the pod mesh's data axes ``(host, dp)`` — each
    shard owns its env batch, replay ring and PRNG stream, so the program's
    math is independent of how many devices the axis is laid out over: the
    8-device pod run and the 1-device run execute the same computation and
    differ only in reduction order. Params/opt state are replicated across
    the data axes (and optionally tensor-sharded over ``tp``)."""
    params: Any            # replicated (or tp-sharded)
    target_params: Any
    opt_state: Any
    buffer: Batch          # [S, C, ...] per-shard replay rings
    position: Any          # [] i32 — identical across shards by construction
    size: Any              # [] i32
    env_states: Any        # [S, E, ...]
    obs: Any               # [S, E, *obs]
    episode_return: Any    # [S, E]
    completed_return: Any  # [] global EMA of completed episode returns
    completed_count: Any   # [] i32
    time: Any              # [] i32
    keys: Any              # [S, 2] per-shard PRNG keys


def make_sharded_actor_learner(env: FunctionalEnv, model, optimizer, mesh,
                               num_shards: int | None = None,
                               envs_per_shard: int = 8,
                               capacity: int = 6_250, batch_size: int = 16,
                               gamma: float = 0.99, double: bool = True,
                               target_update: int = 1, eps_init: float = 1.0,
                               eps_final: float = 0.1, eps_tau: float = 5000.0,
                               learning_starts: int = 32, tp: bool = False,
                               n_steps: int = 1):
    """Fused actor-learner sharded over a pod mesh's data axes.

    This is the end-to-end TPU replacement for the reference's
    sample-collection backend (reference: trainer/evaluation.py:196-290 —
    worker processes collecting trajectories, model files as the parameter
    channel): the collect→replay→update loop is ONE SPMD program in which the
    env batch and replay rings shard over ``(host, dp)`` (DCN × ICI), the
    learner params are replicated (tensor-sharded over ``tp`` if present and
    ``tp=True``), and the gradient mean over the sharded minibatch axis is
    the psum XLA inserts across the data axes.

    ``capacity``/``batch_size``/``envs_per_shard`` are PER SHARD: the
    effective learner batch is ``num_shards * batch_size`` and the effective
    env batch ``num_shards * envs_per_shard``. Returns
    ``(init_fn, segment_fn, shardings_fn)``; ``shardings_fn(state)`` gives
    the matching NamedSharding tree (for checkpoint templates and re-layout).
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rl_agents_tpu.parallel.distributed import data_axes
    from rl_agents_tpu.parallel.mesh import mlp_param_spec

    axes = data_axes(mesh)
    n_data = int(np.prod([mesh.shape[a] for a in axes]))
    S = num_shards or n_data
    if S % n_data:
        raise ValueError(f"num_shards={S} must divide over {n_data} data-axis devices")
    E, C, B = envs_per_shard, capacity, batch_size
    obs_shape = tuple(env.observation_space.shape)
    use_tp = tp and "tp" in mesh.axis_names

    def _lead(x):
        return NamedSharding(mesh, P(axes, *([None] * (x.ndim - 1))))

    def _rep(x):
        return NamedSharding(mesh, P())

    def shardings_fn(state: ShardedActorLearnerState) -> ShardedActorLearnerState:
        if use_tp:
            p_spec = jax.tree.map(lambda s: NamedSharding(mesh, s),
                                  mlp_param_spec(state.params, mesh=mesh))
            t_spec = jax.tree.map(lambda s: NamedSharding(mesh, s),
                                  mlp_param_spec(state.target_params, mesh=mesh))
            o_spec = jax.tree.map(lambda s: NamedSharding(mesh, s),
                                  mlp_param_spec(state.opt_state, mesh=mesh))
        else:
            p_spec = jax.tree.map(_rep, state.params)
            t_spec = jax.tree.map(_rep, state.target_params)
            o_spec = jax.tree.map(_rep, state.opt_state)
        return ShardedActorLearnerState(
            params=p_spec, target_params=t_spec, opt_state=o_spec,
            buffer=jax.tree.map(_lead, state.buffer),
            position=_rep(state.position), size=_rep(state.size),
            env_states=jax.tree.map(_lead, state.env_states),
            obs=_lead(state.obs), episode_return=_lead(state.episode_return),
            completed_return=_rep(state.completed_return),
            completed_count=_rep(state.completed_count),
            time=_rep(state.time), keys=_lead(state.keys))

    def init_fn(key):
        key, kp, ke = jax.random.split(key, 3)
        dummy = jnp.zeros((1,) + obs_shape, jnp.float32)
        params = model.init(kp, dummy)
        env_keys = jax.random.split(ke, S * E).reshape(S, E, 2)
        env_states, obs = jax.vmap(jax.vmap(env.reset, in_axes=(None, 0)),
                                   in_axes=(None, 0))(env.default_params(), env_keys)
        buffer = Batch(
            state=jnp.zeros((S, C) + obs_shape, jnp.float32),
            action=jnp.zeros((S, C), jnp.int32),
            reward=jnp.zeros((S, C), jnp.float32),
            next_state=jnp.zeros((S, C) + obs_shape, jnp.float32),
            terminal=jnp.zeros((S, C), bool),
        )
        state = ShardedActorLearnerState(
            params=params, target_params=jax.tree.map(jnp.copy, params),
            opt_state=optimizer.init(params),
            buffer=buffer, position=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
            env_states=env_states, obs=obs.astype(jnp.float32),
            episode_return=jnp.zeros((S, E)),
            completed_return=jnp.zeros(()), completed_count=jnp.zeros((), jnp.int32),
            time=jnp.zeros((), jnp.int32), keys=jax.random.split(key, S))
        return jax.device_put(state, shardings_fn(state))

    def loss_fn(params, target_params, batch: Batch):
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

    def one_step(state: ShardedActorLearnerState, _):
        params_env = env.default_params()
        subkeys = jax.vmap(lambda k: jax.random.split(k, 6))(state.keys)  # [S,6,2]
        ka, kr, ks, kb, km, knext = (subkeys[:, i] for i in range(6))

        # ---- act: epsilon-greedy, per-shard RNG ----------------------
        eps = eps_final + (eps_init - eps_final) * jnp.exp(
            -state.time.astype(jnp.float32) / eps_tau)
        q = model.apply(state.params,
                        state.obs.reshape((S * E,) + obs_shape)).reshape(S, E, -1)
        greedy = jnp.argmax(q, axis=-1)
        random_actions = jax.vmap(
            lambda k: jax.random.randint(k, (E,), 0, q.shape[-1]))(ka)
        explore = jax.vmap(lambda k: jax.random.uniform(k, (E,)))(kr) < eps
        actions = jnp.where(explore, random_actions, greedy)  # [S, E]

        # ---- env step (vectorised per shard), auto-reset -------------
        step_keys = jax.vmap(lambda k: jax.random.split(k, E))(ks)
        outs = jax.vmap(jax.vmap(env.step, in_axes=(None, 0, 0, 0)),
                        in_axes=(None, 0, 0, 0))(
            params_env, state.env_states, actions, step_keys)
        done = outs.terminated | outs.truncated  # [S, E]
        reset_keys = jax.vmap(lambda k: jax.random.split(k, E))(kb)
        reset_states, reset_obs = jax.vmap(
            jax.vmap(env.reset, in_axes=(None, 0)), in_axes=(None, 0))(
            params_env, reset_keys)
        env_states = jax.tree.map(
            lambda n, r: jnp.where(done.reshape((S, E) + (1,) * (n.ndim - 2)), r, n),
            outs.state, reset_states)
        next_obs = jnp.where(done.reshape((S, E) + (1,) * (outs.obs.ndim - 2)),
                             reset_obs, outs.obs).astype(jnp.float32)

        # global episode-return bookkeeping (sums psum across the mesh)
        episode_return = state.episode_return + outs.reward
        finished = jnp.sum(done.astype(jnp.int32))
        mean_finished = jnp.sum(jnp.where(done, episode_return, 0.0)) \
            / jnp.maximum(finished, 1)
        completed_return = jnp.where(
            finished > 0,
            0.95 * state.completed_return + 0.05 * mean_finished,
            state.completed_return)
        episode_return = jnp.where(done, 0.0, episode_return)

        # ---- per-shard replay write (E rows each) --------------------
        if C % E == 0:
            # aligned ring: one dynamic_update_slice per shard row instead
            # of a scatter (same discipline as the single-mesh loop above)
            def put(arr, rows):
                return jax.lax.dynamic_update_slice_in_dim(
                    arr, rows.astype(arr.dtype), state.position, axis=1)
        else:
            idx = (state.position + jnp.arange(E)) % C

            def put(arr, rows):
                return arr.at[:, idx].set(rows.astype(arr.dtype))

        buffer = Batch(
            state=put(state.buffer.state, state.obs),
            action=put(state.buffer.action, actions),
            reward=put(state.buffer.reward, outs.reward),
            next_state=put(state.buffer.next_state, outs.obs.astype(jnp.float32)),
            terminal=put(state.buffer.terminal, outs.terminated),
        )
        position = (state.position + E) % C
        size = jnp.minimum(state.size + E, C)

        # ---- learner update: shard-local sampling, global grad mean --
        sample_idx = jax.vmap(
            lambda k: jax.random.randint(k, (B,), 0, jnp.maximum(size, 1)))(km)
        if n_steps == 1:
            minibatch = jax.tree.map(
                lambda x: jax.vmap(lambda xs, ids: xs[ids])(x, sample_idx), buffer)
        else:
            minibatch = jax.vmap(
                lambda buf, ids: n_step_collapse(buf, ids, jnp.maximum(size, 1),
                                                 n_steps, jnp.float32(gamma),
                                                 stride=E))(buffer, sample_idx)
        flat = jax.tree.map(lambda x: x.reshape((S * B,) + x.shape[2:]), minibatch)

        def do_update(args):
            params, opt_state = args
            grads = jax.grad(loss_fn)(params, state.target_params, flat)
            grads = jax.tree.map(lambda g: jnp.clip(g, -1.0, 1.0), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        can_train = size >= jnp.maximum(B, learning_starts)
        # masked select instead of lax.cond (same as the single-device
        # learner): a cond nested in the segment scan costs ~0.3 ms of
        # scheduling overhead per step on the v5e; identical visible
        # semantics, a few discarded warm-up updates
        new_params, new_opt = do_update((state.params, state.opt_state))
        params = jax.tree.map(lambda n, o: jnp.where(can_train, n, o),
                              new_params, state.params)
        opt_state = jax.tree.map(lambda n, o: jnp.where(can_train, n, o),
                                 new_opt, state.opt_state)
        time = state.time + 1
        target_params = jax.tree.map(
            lambda p, t: jnp.where(time % target_update == 0, p, t),
            params, state.target_params)

        new_state = ShardedActorLearnerState(
            params=params, target_params=target_params, opt_state=opt_state,
            buffer=buffer, position=position, size=size,
            env_states=env_states, obs=next_obs,
            episode_return=episode_return, completed_return=completed_return,
            completed_count=state.completed_count + finished,
            time=time, keys=knext)
        return new_state, outs.reward.mean()

    @partial(jax.jit, static_argnames=("steps",), donate_argnums=(0,))
    def segment_fn(state: ShardedActorLearnerState, steps: int = 100):
        state, rewards = jax.lax.scan(one_step, state, None, length=steps)
        return state, rewards.mean()

    return init_fn, segment_fn, shardings_fn


def train_dqn_fused(env: FunctionalEnv, model, total_steps: int = 5000,
                    segment: int = 250, seed: int = 0, lr: float = 5e-4,
                    writer=None, **kwargs):
    """Convenience driver: fused DQN training to a step budget; returns the
    final ActorLearnerState and the history of EMA episode returns."""
    optimizer = optax.adam(lr)
    init_fn, segment_fn = make_actor_learner(env, model, optimizer, **kwargs)
    state = init_fn(jax.random.PRNGKey(seed))
    history = []
    for i in range(total_steps // segment):
        state, mean_reward = segment_fn(state, steps=segment)
        ema = float(state.completed_return)
        history.append(ema)
        if writer is not None:
            writer.add_scalar("episode/ema_return", ema, i * segment)
    return state, history
