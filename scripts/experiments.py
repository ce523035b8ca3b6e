"""Experiment CLI: evaluate an agent on an environment, or run benchmarks.

Rebuild of the reference CLI (scripts/experiments.py:1-148; docopt replaced
by argparse — docopt is not in this image). Same command surface:

  experiments.py evaluate <environment> <agent> (--train|--test) [options]
  experiments.py benchmark <benchmark_file> [options]

The reference fans benchmark env x agent products over a multiprocessing
pool (experiments.py:105-106); here runs execute sequentially by default —
on-device batching is the TPU-native parallelism (use --processes for
host-side process fan-out when running CPU-only studies).
"""
from __future__ import annotations

import argparse
import datetime
import json
import sys
from itertools import product
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from rl_agents_tpu import trainer
from rl_agents_tpu.factory import load_agent, load_agent_config, load_environment
from rl_agents_tpu.trainer.evaluation import Evaluation

BENCHMARK_FILE = "benchmark_summary"
LOGGING_CONFIG = Path(__file__).parent / "configs" / "logging.json"
VERBOSE_CONFIG = Path(__file__).parent / "configs" / "verbose.json"


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__,
                                     formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = parser.add_subparsers(dest="command", required=True)

    ev = sub.add_parser("evaluate", help="evaluate an agent on an environment")
    ev.add_argument("environment", help="path to an environment JSON config")
    ev.add_argument("agent", help="path to an agent JSON config")
    mode = ev.add_mutually_exclusive_group(required=True)
    mode.add_argument("--train", action="store_true")
    mode.add_argument("--test", action="store_true")
    ev.add_argument("--episodes", type=int, default=5)
    ev.add_argument("--seed", type=int, default=None)
    ev.add_argument("--recover", action="store_true",
                    help="load model from the latest checkpoint")
    ev.add_argument("--recover-from", type=str, default=None,
                    help="load model from a given checkpoint path")
    ev.add_argument("--no-display", action="store_true")
    ev.add_argument("--name-from-config", action="store_true")
    ev.add_argument("--repeat", type=int, default=1)
    ev.add_argument("--verbose", action="store_true")

    bench = sub.add_parser("benchmark", help="run a benchmark of agents x environments")
    bench.add_argument("benchmark_file", help="path to a benchmark JSON config")
    bench.add_argument("--episodes", type=int, default=5)
    bench.add_argument("--seed", type=int, default=None)
    bench.add_argument("--test", action="store_true")
    bench.add_argument("--processes", type=int, default=1)
    return parser


def evaluate(environment_config, agent_config, args, show=True):
    """Set up and run one evaluation (reference: experiments.py:43-82)."""
    env = load_environment(environment_config)
    agent = load_agent(agent_config, env)
    run_directory = None
    if getattr(args, "name_from_config", False):
        run_directory = "{}_{}_{}".format(
            Path(agent_config).with_suffix("").name if not isinstance(agent_config, dict)
            else agent.__class__.__name__,
            datetime.datetime.now().strftime("%Y%m%d-%H%M%S"), 0)
    recover = None
    if getattr(args, "recover", False):
        recover = True
    elif getattr(args, "recover_from", None):
        recover = args.recover_from
    evaluation = Evaluation(env, agent,
                            run_directory=run_directory,
                            num_episodes=args.episodes,
                            sim_seed=args.seed,
                            recover=recover,
                            display_env=not getattr(args, "no_display", True),
                            display_agent=False,
                            display_rewards=False)
    if getattr(args, "train", False):
        evaluation.train()
    else:
        evaluation.test()
    if show:
        rewards = evaluation.episode_rewards
        print(f"Run directory: {evaluation.run_directory}")
        print(f"Episode rewards: {[round(r, 1) for r in rewards]}")
    return str(evaluation.run_directory)


def generate_agent_configs(benchmark_config):
    """Expand parameter sweeps into agent config dicts
    (reference: experiments.py:119-144)."""
    agents = []
    for agent_path in benchmark_config["agents"]:
        if isinstance(agent_path, dict) and "base_agent" in agent_path:
            base = load_agent_config(agent_path["base_agent"])
            keys, value_lists = zip(*agent_path["sweep"].items())
            for values in product(*value_lists):
                config = json.loads(json.dumps(base))
                for key, value in zip(keys, values):
                    node = config
                    parts = key.split("/")
                    for part in parts[:-1]:
                        node = node.setdefault(part, {})
                    node[parts[-1]] = value
                agents.append(config)
        else:
            agents.append(agent_path)
    return agents


def benchmark(args):
    """(reference: experiments.py:85-116)"""
    with open(args.benchmark_file) as f:
        benchmark_config = json.load(f)
    agents = generate_agent_configs(benchmark_config)
    environments = benchmark_config["environments"]
    experiments = list(product(environments, agents))
    print(f"Running {len(experiments)} experiments "
          f"({len(environments)} environments x {len(agents)} agents)")
    results = []
    if args.processes > 1:
        from multiprocessing import Pool

        with Pool(args.processes) as pool:
            results = pool.starmap(
                evaluate, [(env, agent, args, False) for env, agent in experiments])
    else:
        for env_config, agent_config in experiments:
            results.append(evaluate(env_config, agent_config, args, show=False))
    summary = Path(args.benchmark_file).with_name(
        f"{BENCHMARK_FILE}.{datetime.datetime.now().strftime('%Y%m%d-%H%M%S')}.json")
    with open(summary, "w") as f:
        json.dump(results, f, indent=2)
    print(f"Benchmark summary written to {summary}")


def main():
    args = build_parser().parse_args()
    if getattr(args, "verbose", False):
        trainer.logger.configure(default_level="DEBUG")
    if args.command == "evaluate":
        for _ in range(args.repeat):
            evaluate(args.environment, args.agent, args)
    elif args.command == "benchmark":
        benchmark(args)


if __name__ == "__main__":
    main()
