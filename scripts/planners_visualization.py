"""Render expanded planner trees on toy environments.

Rebuild of the reference (scripts/planners_visualization.py): plan once with
several planners on a toy env and save tree figures.

Usage: planners_visualization.py [--out DIR] [--budget N]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from rl_agents_tpu.factory import load_agent, load_environment
from rl_agents_tpu.graphics.tree_plot import TreePlot


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="out/trees")
    parser.add_argument("--budget", type=int, default=100)
    parser.add_argument("--env", default=None)
    args = parser.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    env_config = args.env or {"id": "gridenv"}
    agents = {
        "opd": {"__class__": "DeterministicPlannerAgent", "gamma": 0.8},
        "uct": {"__class__": "MCTSAgent", "gamma": 0.8},
        "kl-olop": {"__class__": "OLOPAgent", "gamma": 0.8},
    }
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for name, config in agents.items():
        env = load_environment(env_config)
        agent = load_agent({**config, "budget": args.budget}, env)
        agent.seed(0)
        obs, _ = env.reset(seed=0)
        agent.plan(obs)
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.axis("off")
        ax.set_title(name)
        TreePlot(agent.last_plan_data, max_depth=6).plot(ax)
        path = out / f"{name}.png"
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print(f"Wrote {path}")


if __name__ == "__main__":
    main()
