"""Benchmark: planner env-steps/s per chip on highway driving, vs the reference.

BASELINE.md config 4: MCTS/UCT planning on highway-v0 with 4096 parallel
trees. Runs the array-encoded MCTS over 4096 vmapped trees on the functional
highway env (15 vehicles, 4 lanes) on the default JAX device (the TPU chip
under the driver). The baseline denominator is the reference's pure-Python
MCTS planner driven on the same functional env on this machine's CPU.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# keep a CPU backend available for the reference-baseline measurement even
# when the driver pins JAX_PLATFORMS to the TPU platform
if os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp

EPISODES, HORIZON = 23, 8  # OLOP allocation of budget 184 at gamma 0.95


def bench_tpu(B=4096, repeats=5):
    from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    probs = jnp.ones(5) / 5

    def run():
        a, l, t = mcts_plan_batch(env, params, states0, keys, probs, probs,
                                  5, EPISODES, HORIZON, 0.95, 40.0)
        jax.block_until_ready(a)
        return a

    run()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    dt = statistics.median(times)
    steps = B * EPISODES * HORIZON  # rollout env steps per plan (conservative)
    return steps / dt


def bench_reference(trials=3):
    """Reference MCTS planner (python object tree) on the same env."""
    sys.path.insert(0, "/root/reference")
    import types

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    from rl_agents_tpu.envs.highway import make as make_highway

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        env = make_highway({"vehicles_count": 15, "lanes_count": 4})
        env.reset(seed=0)
        planner = MCTS(env, MCTSAgent.random_policy, MCTSAgent.random_policy,
                       {"budget": EPISODES * HORIZON, "gamma": 0.95, "temperature": 40,
                        "horizon": None, "closed_loop": False})
        planner.seed(0)
        planner.step_by_reset()
        planner.plan(state=env.fork(), observation=None)  # warm compiles
        planner.observations = []
        steps = 0
        t0 = time.time()
        for _ in range(trials):
            planner.step_by_reset()
            planner.plan(state=env.fork(), observation=None)
            steps += len(planner.observations)
            planner.observations = []
        dt = time.time() - t0
    return steps / dt


def main():
    value = bench_tpu()
    try:
        baseline = bench_reference()
    except Exception as e:
        print(f"reference baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "mcts_highway_env_steps_per_sec_4096trees",
        "value": round(value),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(vs, 1) if vs else None,
    }))


if __name__ == "__main__":
    main()
