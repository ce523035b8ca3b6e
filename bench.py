"""Benchmark: planner env-steps/s per chip, vs the reference implementation.

Runs the MCTS planner over 4096 parallel trees on the functional CartPole env
(BASELINE.md config 4 shape) on the default JAX device (the TPU chip under the
driver), and measures the reference's pure-Python MCTS planner on the same
machine/env as the baseline denominator.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def bench_tpu(B=4096, episodes=23, horizon=8, repeats=5):
    from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch
    from rl_agents_tpu.envs.cartpole import CartPoleEnv

    env = CartPoleEnv(max_episode_steps=200)
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    probs = jnp.ones(2) / 2

    def run():
        a, l, t = mcts_plan_batch(env, params, states0, keys, probs, probs,
                                  2, episodes, horizon, 0.95, 40.0)
        jax.block_until_ready(a)
        return a

    run()  # compile
    t0 = time.time()
    for _ in range(repeats):
        run()
    dt = (time.time() - t0) / repeats
    # env steps actually executed per tree episode: up to `horizon` in the
    # descent and exactly `horizon` in the rollout scan; count the rollout
    # steps only (conservative).
    steps = B * episodes * horizon
    return steps / dt


def bench_reference(budget=184, trials=3):
    """Reference MCTS planner (pure python object tree) on the same env."""
    sys.path.insert(0, "/root/reference")
    import types

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    from rl_agents_tpu.envs.cartpole import make as make_cartpole

    # The reference is a host-python planner: pin its env stepping to the CPU
    # backend so per-step dispatch doesn't cross the TPU tunnel.
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        env = make_cartpole({"max_episode_steps": 200})
        env.reset(seed=0)
        planner = MCTS(env, MCTSAgent.random_policy, MCTSAgent.random_policy,
                       {"budget": budget, "gamma": 0.95, "temperature": 40,
                        "horizon": None, "closed_loop": False})
        planner.seed(0)
        # warm the env step/reset compiles outside the timed region
        planner.step_by_reset()
        planner.plan(state=env.fork(), observation=None)
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
        "metric": "mcts_env_steps_per_sec_4096trees",
        "value": round(value),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(vs, 1) if vs else None,
    }))


if __name__ == "__main__":
    main()
