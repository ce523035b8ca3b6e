"""Config-driven fused training: the `"fused": true` DQN path through the
harness (Evaluation.run_fused_training -> DQNAgent.train_fused ->
parallel/actor_learner.py) must train on-device, sync the learned params
back into the agent, checkpoint, and leave the agent usable for greedy
evaluation — the reference's whole train loop (evaluation.py:115-194) as
one program."""
import numpy as np

from rl_agents_tpu.factory import load_agent, load_environment
from rl_agents_tpu.trainer.evaluation import Evaluation

AGENT_CONFIG = {
    "__class__": "DQNAgent",
    "fused": True,
    "fused_envs": 16,
    "model": {"type": "MultiLayerPerceptron", "layers": [32, 32]},
    "exploration": {"tau": 500},
    "target_update": 50,
    "memory_capacity": 5000,
}


def test_fused_training_via_harness(tmp_path):
    env = load_environment({"id": "cartpole", "max_episode_steps": 100})
    agent = load_agent(dict(AGENT_CONFIG), env)
    before = [np.asarray(p).copy() for p in
              np.asarray(agent.train_state.params["params"]["Dense_0"]["kernel"])[None]]
    ev = Evaluation(env, agent, directory=tmp_path, num_episodes=400,
                    display_env=False, sim_seed=0)
    ev.train()

    # params actually moved and were synced back into the agent
    after = np.asarray(agent.train_state.params["params"]["Dense_0"]["kernel"])
    assert not np.allclose(after, before[0])
    assert agent.steps > 0
    # target net synced at cadence (not still the init copy)
    tgt = np.asarray(agent.train_state.target_params["params"]["Dense_0"]["kernel"])
    assert not np.allclose(tgt, before[0])
    # final checkpoint written by close()
    assert any(p.name.startswith("checkpoint-final") or p.name == "latest.tar"
               for p in (tmp_path).rglob("*.tar"))

    # the trained agent acts greedily through the normal object path
    agent.eval()
    obs, _ = env.reset(seed=3)
    total = 0.0
    for _ in range(100):
        obs, reward, term, trunc, _ = env.step(agent.act(obs))
        total += reward
        if term or trunc:
            break
    assert total >= 30, f"greedy rollout too short after fused training: {total}"
