"""Benchmark: planner/learner throughput per chip vs the reference.

Headline (BASELINE.md configs 2/4): MCTS/UCT planning at 4096 parallel trees,
env-steps/s per chip. The numerator runs the fused array-encoded MCTS on the
functional CartPole env on the default JAX device (the TPU chip under the
driver). The denominator runs the reference's pure-Python object-tree MCTS
planner on gymnasium's numpy CartPole — the reference's natural, dispatch-free
substrate — with the identical budget/episodes/horizon/temperature, so the
ratio measures planner architecture, not substrate overhead
(reference: rl_agents/agents/tree_search/mcts.py:116-200).

Extra metrics reported in the same JSON line:
  - mcts_highway_steps_per_sec: 4096-tree MCTS on the functional highway env
  - opd_expansions_per_sec: 4096-tree OPD expansions/s (highway)
  - dqn_env_steps_per_sec: fused actor-learner (128 envs, one SGD update per
    env step, matching the reference's target_update=1 recipe)

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
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
GAMMA, TEMPERATURE = 0.95, 40.0
B = 4096


def _median_time(run, repeats=5):
    run()  # compile
    times = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return statistics.median(times)


def bench_mcts_cartpole():
    """Fused MCTS, 4096 trees, functional CartPole → env-steps/s."""
    from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch
    from rl_agents_tpu.envs.cartpole import CartPoleEnv

    env = CartPoleEnv(max_episode_steps=200)
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    probs = jnp.ones(2) / 2

    def run():
        a, _, _ = mcts_plan_batch(env, params, states0, keys, probs, probs,
                                  2, EPISODES, HORIZON, GAMMA, TEMPERATURE)
        jax.block_until_ready(a)

    dt = _median_time(run)
    return B * EPISODES * HORIZON / dt


def bench_mcts_highway():
    from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    probs = jnp.ones(5) / 5

    def run():
        a, _, _ = mcts_plan_batch(env, params, states0, keys, probs, probs,
                                  5, EPISODES, HORIZON, GAMMA, TEMPERATURE)
        jax.block_until_ready(a)

    dt = _median_time(run)
    return B * EPISODES * HORIZON / dt


def bench_opd_highway(expansions=46):
    """4096-tree OPD on highway → node expansions/s (budget 230 / 5 actions)."""
    from rl_agents_tpu.agents.tree_search.deterministic import opd_plan_batch
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    def run():
        a, _, _ = opd_plan_batch(env, params, states0, keys, num_actions=5,
                                 expansions=expansions, gamma=GAMMA,
                                 plan_capacity=8)
        jax.block_until_ready(a)

    dt = _median_time(run)
    return B * expansions / dt


def bench_dqn_fused(num_envs=128, steps=500):
    """Fused actor-learner on CartPole: env-steps/s with one SGD/env-step."""
    import optax

    from rl_agents_tpu.envs.cartpole import CartPoleEnv
    from rl_agents_tpu.models import MultiLayerPerceptron
    from rl_agents_tpu.parallel.actor_learner import make_actor_learner

    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(64, 64), out=2)
    init_fn, segment_fn = make_actor_learner(env, model, optax.adam(5e-4),
                                             num_envs=num_envs, capacity=50_000,
                                             batch_size=100)
    state = init_fn(jax.random.PRNGKey(0))
    state, _ = segment_fn(state, steps=steps)  # compile + warm
    jax.block_until_ready(state.params)
    t0 = time.time()
    state, _ = segment_fn(state, steps=steps)
    jax.block_until_ready(state.params)
    dt = time.time() - t0
    return steps * num_envs / dt


def bench_reference_mcts_cartpole(trials=3):
    """Reference MCTS (python object tree) on gymnasium's numpy CartPole —
    the reference's natural substrate, zero JAX dispatch in the loop."""
    sys.path.insert(0, "/root/reference")
    import types

    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    import gymnasium as gym
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    env = gym.make("CartPole-v1")
    env.reset(seed=0)
    planner = MCTS(env, MCTSAgent.random_policy, MCTSAgent.random_policy,
                   {"budget": EPISODES * HORIZON, "gamma": GAMMA,
                    "temperature": TEMPERATURE, "horizon": None,
                    "closed_loop": False})
    planner.seed(0)
    planner.step_by_reset()
    planner.plan(state=env, observation=None)  # warm-up
    planner.observations = []
    steps = 0
    t0 = time.time()
    for _ in range(trials):
        planner.step_by_reset()
        planner.plan(state=env, observation=None)
        steps += len(planner.observations)
        planner.observations = []
    dt = time.time() - t0
    return steps / dt


def main():
    value = bench_mcts_cartpole()
    extra = {}
    for name, fn in [("mcts_highway_steps_per_sec", bench_mcts_highway),
                     ("opd_highway_expansions_per_sec", bench_opd_highway),
                     ("dqn_fused_env_steps_per_sec", bench_dqn_fused)]:
        try:
            extra[name] = round(fn())
        except Exception as e:  # pragma: no cover - report partial results
            print(f"{name} failed: {e}", file=sys.stderr)
            extra[name] = None
    try:
        baseline = bench_reference_mcts_cartpole()
    except Exception as e:
        print(f"reference baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "mcts_cartpole_env_steps_per_sec_4096trees",
        "value": round(value),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(vs, 1) if vs else None,
        "baseline_method": ("reference python MCTS on gymnasium CartPole-v1 "
                            "(numpy substrate), same budget=184/episodes=23/"
                            "horizon=8/temperature=40"),
        "baseline_value": round(baseline) if baseline else None,
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
