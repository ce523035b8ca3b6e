"""Fused actor-learner tests: the on-device DQN must learn CartPole."""
import time

import jax
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
