"""Harness integration test (mirrors reference tests/trainer/test_evaluation.py:8-19)."""
import glob
import json
import os

from rl_agents_tpu.agents.simple import OpenLoopAgent, RandomUniformAgent
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.trainer.evaluation import Evaluation, capped_cubic_video_schedule


def test_evaluation(tmpdir):
    env = make_cartpole({"max_episode_steps": 30})
    agent = RandomUniformAgent(env)
    evaluation = Evaluation(env, agent, directory=tmpdir, num_episodes=3,
                            display_env=False, display_agent=False, display_rewards=False)
    evaluation.train()
    assert any("metadata" in f for f in os.listdir(evaluation.run_directory))
    # metadata is valid JSON with env+agent sections
    meta_file = glob.glob(str(evaluation.run_directory / "metadata*"))[0]
    with open(meta_file) as f:
        metadata = json.load(f)
    assert "env" in metadata and "agent" in metadata
    assert len(evaluation.episode_rewards) == 3


def test_evaluation_seeding_protocol(tmpdir):
    env = make_cartpole({"max_episode_steps": 20})
    agent = OpenLoopAgent(env, {"actions": [0, 1] * 20})
    ev1 = Evaluation(env, agent, directory=tmpdir, num_episodes=2, sim_seed=42,
                     display_env=False, display_rewards=False, close_env=False)
    ev1.train()
    r1 = list(ev1.episode_rewards)

    agent.reset()
    ev2 = Evaluation(env, agent, directory=tmpdir, num_episodes=2, sim_seed=42,
                     display_env=False, display_rewards=False, close_env=False)
    ev2.train()
    assert ev2.episode_rewards == r1  # same seeds -> identical trajectories


def test_cubic_schedule():
    hits = [e for e in range(30) if capped_cubic_video_schedule(e)]
    assert hits == [0, 1, 8, 27]
    assert capped_cubic_video_schedule(1000)
    assert not capped_cubic_video_schedule(999)
