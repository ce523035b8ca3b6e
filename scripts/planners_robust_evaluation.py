"""Robust-agent comparison study.

Rebuild of the reference (scripts/planners_robust_evaluation.py): compare a
nominal planner, the robust planner (DROP) and the oracle on an uncertain
environment, accumulating per-seed returns.

Usage: planners_robust_evaluation.py [--seeds N] [--budget N] [--out DIR]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from rl_agents_tpu.factory import load_agent, load_environment


def run_episode(env, agent, seed, horizon=20):
    agent.seed(seed)
    obs, _ = env.reset(seed=seed)
    total, done, trunc, steps = 0.0, False, False, 0
    while not (done or trunc) and steps < horizon:
        action = agent.act(obs)
        obs, r, done, trunc, _ = env.step(action)
        total += r
        steps += 1
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--budget", type=int, default=60)
    parser.add_argument("--out", default="out/robust")
    args = parser.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    env_config = {"id": "finite-mdp", "mode": "deterministic",
                  "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
                  "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
                  "terminal": [0, 0, 0, 0], "max_episode_steps": 50}
    agents = {
        "nominal": {"__class__": "DeterministicPlannerAgent",
                    "budget": args.budget, "gamma": 0.9},
        "DROP": {"__class__": "DiscreteRobustPlannerAgent",
                 "budget": args.budget, "gamma": 0.9, "models": []},
    }
    rows = []
    for name, config in agents.items():
        returns = []
        for seed in range(args.seeds):
            env = load_environment(env_config)
            agent = load_agent(config, env)
            returns.append(run_episode(env, agent, seed))
        rows.append((name, np.mean(returns), np.std(returns)))
        print(f"{name:10s}: return {np.mean(returns):.2f} +- {np.std(returns):.2f}")

    with open(out / "results.csv", "w") as f:
        f.write("agent,mean_return,std_return\n")
        for name, mean, std in rows:
            f.write(f"{name},{mean},{std}\n")
    print(f"Wrote {out / 'results.csv'}")


if __name__ == "__main__":
    main()
