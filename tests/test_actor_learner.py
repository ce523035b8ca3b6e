"""Fused actor-learner tests: the on-device DQN must learn CartPole."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rl_agents_tpu.envs.cartpole import CartPoleEnv
from rl_agents_tpu.models import MultiLayerPerceptron
from rl_agents_tpu.parallel.actor_learner import make_actor_learner, train_dqn_fused


def test_fused_dqn_learns_cartpole():
    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(64, 64), out=2)
    state, history = train_dqn_fused(
        env, model, total_steps=6000, segment=500, seed=0,
        num_envs=8, capacity=10_000, batch_size=64, gamma=0.99,
        eps_tau=1500.0, target_update=50)
    # EMA of completed episode returns must improve well beyond random (~20)
    assert history[-1] > 60, f"no learning: {history}"
    assert history[-1] > history[0]


def test_fused_segment_throughput():
    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(64, 64), out=2)
    optimizer = optax.adam(5e-4)
    init_fn, segment_fn = make_actor_learner(env, model, optimizer, num_envs=8,
                                             capacity=5000, batch_size=32)
    state = init_fn(jax.random.PRNGKey(0))
    state, _ = segment_fn(state, steps=50)  # compile
    t0 = time.time()
    state, _ = segment_fn(state, steps=50)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    # 50 steps x 8 envs with per-step SGD in one program: must be fast even on CPU
    assert dt < 5.0


def test_fused_updates_per_step():
    """``updates_per_step=U`` runs U distinct SGD updates per collected
    env-step batch (the throughput-optimal regime): with identical init and
    data stream, U=4 must move the params strictly further than U=1 after
    the learning threshold is crossed."""
    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(16, 16), out=2)

    def run(updates_per_step):
        init_fn, segment_fn = make_actor_learner(
            env, model, optax.sgd(1e-2), num_envs=8, capacity=512,
            batch_size=16, learning_starts=16, updates_per_step=updates_per_step)
        state = init_fn(jax.random.PRNGKey(3))
        p0 = jax.tree.map(jnp.copy, state.params)
        state, _ = segment_fn(state, steps=20)
        delta = sum(float(jnp.sum(jnp.abs(a - b)))
                    for a, b in zip(jax.tree.leaves(state.params),
                                    jax.tree.leaves(p0)))
        return delta, state

    d1, s1 = run(1)
    d4, s4 = run(4)
    assert d1 > 0 and d4 > d1, (d1, d4)
    assert int(s4.time) == 20
    for leaf in jax.tree.leaves(s4.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_fused_slices_sampling_learns():
    """``sample_mode="slices"`` (whole random time-slices of independent
    envs instead of a random-row gather — the throughput path) must still
    learn CartPole: same unbiased per-transition marginal."""
    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(64, 64), out=2)
    init_fn, segment_fn = make_actor_learner(
        env, model, optax.adam(1e-3), num_envs=8, capacity=4096,
        batch_size=64, learning_starts=64, eps_tau=1500.0, target_update=50,
        sample_mode="slices")
    state = init_fn(jax.random.PRNGKey(0))
    history = []
    for _ in range(12):
        state, _ = segment_fn(state, steps=500)
        history.append(float(state.completed_return))
    assert history[-1] > 60, f"no learning with slice sampling: {history}"


def test_fused_slices_requires_alignment():
    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(16,), out=2)
    import pytest

    with pytest.raises(ValueError):
        make_actor_learner(env, model, optax.adam(1e-3), num_envs=8,
                           batch_size=100, sample_mode="slices")


def test_fused_n_step_collapse_stride():
    """n-step in the fused loop: same-env consecutive transitions sit at
    stride E in the interleaved ring, so the collapsed targets must match a
    hand-built per-env trajectory collapse (reference: memory.py:58-77)."""
    import numpy as np

    from rl_agents_tpu.agents.dqn.replay import Batch, n_step_collapse

    E, T, gamma, n = 3, 5, 0.9, 3
    # build an interleaved ring: position t*E + e holds env e's step t
    rng = np.random.default_rng(0)
    rewards = rng.random((T, E)).astype(np.float32)
    terminals = np.zeros((T, E), bool)
    terminals[2, 1] = True  # env 1 ends at step 2
    states = rng.random((T, E, 4)).astype(np.float32)
    next_states = rng.random((T, E, 4)).astype(np.float32)
    size = T * E
    data = Batch(
        state=jnp.asarray(states.reshape(size, 4)),
        action=jnp.zeros((size,), jnp.int32),
        reward=jnp.asarray(rewards.reshape(size)),
        next_state=jnp.asarray(next_states.reshape(size, 4)),
        terminal=jnp.asarray(terminals.reshape(size)),
    )
    # start at (t=0, env) for every env
    start = jnp.asarray([0 * E + e for e in range(E)], jnp.int32)
    out = n_step_collapse(data, start, jnp.int32(size), n, jnp.float32(gamma),
                          stride=E)
    for e in range(E):
        # hand collapse of env e's trajectory from step 0
        cum, last = 0.0, 0
        for i in range(n):
            cum += gamma ** i * rewards[i, e]
            last = i
            if terminals[i, e]:
                break
        np.testing.assert_allclose(float(out.reward[e]), cum, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.next_state[e]),
                                   next_states[last, e], rtol=1e-6)
        assert bool(out.terminal[e]) == bool(terminals[last, e])


def test_fused_actor_learner_n_step_trains():
    import optax

    from rl_agents_tpu.envs.cartpole import CartPoleEnv
    from rl_agents_tpu.models import MultiLayerPerceptron
    from rl_agents_tpu.parallel.actor_learner import make_actor_learner

    env = CartPoleEnv(max_episode_steps=100)
    model = MultiLayerPerceptron(layers=(16, 16), out=2)
    init_fn, segment_fn = make_actor_learner(
        env, model, optax.adam(1e-3), num_envs=8, capacity=1024,
        batch_size=16, learning_starts=64, n_steps=3)
    state = init_fn(jax.random.PRNGKey(0))
    state, mean_reward = segment_fn(state, steps=40)
    assert np.isfinite(float(mean_reward))
    for leaf in jax.tree.leaves(state.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))
