import numpy as np

from rl_agents_tpu.agents.fitted_q import FTQAgent
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.trainer.evaluation import Evaluation


def test_ftq_update_fits_q():
    env = make_cartpole({"max_episode_steps": 30})
    agent = FTQAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [32]},
                           "gamma": 0.8, "regression_epochs": 300,
                           "optimizer": {"type": "ADAM", "lr": 1e-2},
                           "value_iteration_epochs": 3, "memory_capacity": 500})
    agent.seed(0)
    state, _ = env.reset(seed=0)
    for i in range(100):
        action = i % 2
        next_state, reward, done, truncated, info = env.step(action)
        agent.record(state, action, reward, next_state, done, info)
        state = next_state
        if done or truncated:
            state, _ = env.reset()
    assert len(agent.memory) == 100
    agent.update()
    q = agent.get_state_action_values(np.zeros(4))
    assert np.isfinite(q).all()
    # values should approach sum of discounted unit rewards, not stay at init 0
    assert np.abs(q).max() > 0.5


def test_ftq_batched_through_evaluation(tmpdir):
    env = make_cartpole({"max_episode_steps": 20})
    agent = FTQAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [16]},
                           "gamma": 0.8, "regression_epochs": 5,
                           "value_iteration_epochs": 2, "batch_size": 70,
                           "memory_capacity": 500})
    assert agent.batched
    evaluation = Evaluation(env, agent, directory=tmpdir, num_episodes=5,
                            display_rewards=False, close_env=False)
    evaluation.train()  # routes through run_batched_episodes
    assert len(agent.memory) > 0


def test_ftq_save_load_memory(tmp_path):
    env = make_cartpole({})
    agent = FTQAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [8]}})
    state, _ = env.reset(seed=0)
    for i in range(10):
        agent.record(np.zeros(4), 0, 1.0, np.ones(4), False, {})
    path = agent.save(tmp_path / "ftq.tar")
    agent2 = FTQAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [8]}})
    agent2.load(path)
    assert len(agent2.memory) == 10
