"""Record the reference DQN CartPole learning curve (BASELINE.md config 2).

Runs the reference torch DQNAgent (CPU) with the reference's CartPole config
(scripts/configs/CartPoleEnv/DQNAgent.json: MLP [100, 100], exploration tau
6000, defaults from deep_q_network/abstract.py:21-35) for 200 training
episodes at several fixed seeds, mirroring the Evaluation seeding protocol
(reference: trainer/evaluation.py:372-376: per-episode ``reset(seed=episode)``
is skipped there — env reset unseeded — and ``agent.seed(sim_seed+episode)``).

Writes tests/data/dqn_cartpole_reference_curve.json with per-seed episode
returns and summary statistics. Checked-in artifact; re-run this script to
regenerate:

    JAX_PLATFORMS=cpu python tests/data/generate_dqn_reference_curve.py
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/reference")
np.infty = np.inf
if "numba" not in sys.modules:
    import types

    numba = types.ModuleType("numba")
    numba.jit = lambda *a, **k: (lambda f: f)
    sys.modules["numba"] = numba

import gymnasium as gym  # noqa: E402

from rl_agents.agents.deep_q_network.pytorch import DQNAgent  # noqa: E402

EPISODES = 200
SEEDS = [0, 1, 2, 3, 4]
WINDOW = 50  # final-window mean, the comparison statistic


def run_seed(seed: int):
    import torch

    torch.manual_seed(seed)
    env = gym.make("CartPole-v0")
    agent = DQNAgent(env, {
        "model": {"type": "MultiLayerPerceptron", "layers": [100, 100]},
        "exploration": {"tau": 6000},
        "device": "cpu",
    })
    agent.seed(seed)
    returns = []
    for episode in range(EPISODES):
        obs, _ = env.reset(seed=seed * 10_000 + episode)
        agent.seed(seed + episode)
        agent.reset()
        done, total = False, 0.0
        while not done:
            action = agent.act(obs)
            next_obs, reward, terminated, truncated, _ = env.step(int(action))
            done = terminated or truncated
            agent.record(obs, action, reward, next_obs, done, {})
            obs = next_obs
            total += reward
        returns.append(total)
    return returns


def main():
    curves = {}
    for seed in SEEDS:
        t0 = time.time()
        curves[str(seed)] = run_seed(seed)
        print(f"seed {seed}: final-{WINDOW} mean "
              f"{np.mean(curves[str(seed)][-WINDOW:]):.1f} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr)
    finals = [float(np.mean(c[-WINDOW:])) for c in curves.values()]
    out = {
        "env": "CartPole-v0",
        "episodes": EPISODES,
        "window": WINDOW,
        "config": {"model": "MultiLayerPerceptron [100, 100]",
                   "exploration_tau": 6000, "defaults": "deep_q_network/abstract.py:21-35"},
        "seeds": SEEDS,
        "final_window_means": finals,
        "final_window_mean": float(np.mean(finals)),
        "final_window_std": float(np.std(finals)),
        "returns": curves,
    }
    path = Path(__file__).parent / "dqn_cartpole_reference_curve.json"
    path.write_text(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
