"""DQN integration tests (mirrors reference tests/agents/dqn/test_dqn_pytorch.py:4-28
plus replay/exploration units)."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.dqn.agent import DQNAgent
from rl_agents_tpu.agents.dqn.exploration import exploration_factory
from rl_agents_tpu.agents.dqn.replay import ReplayMemory
from rl_agents_tpu.envs.cartpole import make as make_cartpole


def test_dqn_cartpole_smoke():
    env = make_cartpole({})
    agent = DQNAgent(env, {
        "model": {"type": "MultiLayerPerceptron", "layers": [16, 16]},
        "memory_capacity": 1000, "batch_size": 32, "target_update": 5,
    })
    agent.seed(0)
    state, _ = env.reset(seed=0)
    for _ in range(2 * 32):
        action = agent.act(state)
        assert action is not None
        next_state, reward, done, truncated, info = env.step(action)
        agent.record(state, action, reward, next_state, done, info)
        state = next_state
        if done or truncated:
            state, _ = env.reset()
    assert len(agent.memory) == 2 * 32


def test_dqn_loss_decreases_on_fixed_batch():
    env = make_cartpole({})
    agent = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [32]},
                           "batch_size": 16, "double": False})
    from rl_agents_tpu.agents.dqn.replay import Batch

    rng = np.random.default_rng(0)
    batch = Batch(
        state=jnp.asarray(rng.random((16, 4)), jnp.float32),
        action=jnp.asarray(rng.integers(0, 2, 16), jnp.int32),
        reward=jnp.asarray(rng.random(16), jnp.float32),
        next_state=jnp.asarray(rng.random((16, 4)), jnp.float32),
        terminal=jnp.zeros(16, bool),
    )
    state = agent.train_state
    first_loss = None
    for i in range(50):
        state, loss = agent.train_step(state, batch)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss


def test_dqn_save_load(tmp_path):
    env = make_cartpole({})
    agent = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [8]}})
    q_before = agent.get_state_action_values(np.ones(4))
    path = agent.save(tmp_path / "model.tar")
    agent2 = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [8]}})
    agent2.load(path)
    np.testing.assert_allclose(agent2.get_state_action_values(np.ones(4)), q_before,
                               atol=1e-6)


def test_dqn_eval_switches_to_greedy():
    env = make_cartpole({})
    agent = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [8]}})
    agent.eval()
    dist = agent.action_distribution(np.zeros(4))
    assert max(dist.values()) == 1.0


def test_replay_ring_and_nstep():
    mem = ReplayMemory(capacity=8, obs_shape=(2,), n_steps=1)
    for i in range(12):
        mem.push(np.full(2, i), i % 2, float(i), np.full(2, i + 1), False)
    assert len(mem) == 8 and mem.is_full()
    batch = mem.sample(jax.random.PRNGKey(0), 4)
    assert batch.state.shape == (4, 2)

    # n-step collapse: rewards accumulate with discount until terminal
    mem3 = ReplayMemory(capacity=16, obs_shape=(1,), n_steps=3, gamma=0.5)
    for i in range(10):
        mem3.push(np.full(1, i), 0, 1.0, np.full(1, i + 1), i == 4)
    batch = mem3.sample(jax.random.PRNGKey(1), 8)
    # every collapsed reward is in [1, 1 + 0.5 + 0.25]
    r = np.asarray(batch.reward)
    assert np.all(r >= 1.0 - 1e-6) and np.all(r <= 1.75 + 1e-6)


def test_exploration_schedules():
    expl = exploration_factory({"method": "EpsilonGreedy", "temperature": 1.0,
                                "final_temperature": 0.1, "tau": 10}, type("S", (), {"n": 3})())
    expl.seed(0)
    expl.update(np.array([0.0, 1.0, 0.0]))
    eps0 = expl.epsilon
    for _ in range(100):
        expl.step_time()
    expl.update(np.array([0.0, 1.0, 0.0]))
    assert expl.epsilon < eps0
    dist = expl.get_distribution()
    assert abs(sum(dist.values()) - 1.0) < 1e-9
    assert dist[1] == max(dist.values())

    boltz = exploration_factory({"method": "Boltzmann"}, type("S", (), {"n": 3})())
    boltz.seed(0)
    boltz.update(np.array([0.0, 10.0, 0.0]))
    assert boltz.get_distribution()[1] > 0.9
