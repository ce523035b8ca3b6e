"""Bit-exact MCTS parity vs the reference at fixed seeds (BASELINE.md north
star, extended from OPD to an RNG-dependent planner).

Both planners run on the SAME functional env (the reference drives our
EnvHandle, which quacks like a gym env and forks cheaply) under x64, so every
reward/value/tie-break comparison is over identical float64 values; the PCG64
stream (utils/pcg64.py) reproduces numpy's Generator draw-for-draw.
"""
import sys

import numpy as np
import pytest
from jax import enable_x64

from rl_agents_tpu.agents.tree_search.mcts_parity import mcts_plan_parity
from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.utils.pcg64 import pcg64_init

LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}
EPISODES, HORIZON, GAMMA, TEMPERATURE = 25, 6, 0.8, 10.0


def reference_mcts_plan(env_handle, seed):
    sys.path.insert(0, "/root/reference")
    if "numba" not in sys.modules:  # the image has no numba; stub @jit
        import types

        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    planner = MCTS(env_handle, MCTSAgent.random_policy, MCTSAgent.random_policy,
                   {"episodes": EPISODES, "horizon": HORIZON, "gamma": GAMMA,
                    "temperature": TEMPERATURE, "closed_loop": False,
                    "step_strategy": "reset", "budget": EPISODES * HORIZON})
    planner.seed(seed)
    planner.step_by_reset()
    actions = planner.plan(state=env_handle, observation=None)
    return [int(a) for a in actions], planner


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_mcts_bit_exact_parity(seed):
    with enable_x64():
        env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
        env.reset(seed=0)
        ref_actions, ref_planner = reference_mcts_plan(env.fork(), seed)

        stream, inc = pcg64_init(seed)
        actions, length, arena, _, _ = mcts_plan_parity(
            env.functional, env.params, env.state, stream, inc,
            num_actions=3, episodes=EPISODES, horizon=HORIZON,
            gamma=GAMMA, temperature=TEMPERATURE)
        our_actions = [int(a) for a in np.asarray(actions)[:int(length)]]

        assert our_actions == ref_actions
        # root statistics: every episode passes through the root
        assert int(arena.count[0]) == ref_planner.root.count == EPISODES
        assert float(arena.value[0]) == ref_planner.root.value  # bit-exact
        # per-root-child statistics, exactly
        ch = np.asarray(arena.children[0])
        for a in range(3):
            node = ref_planner.root.children[a]
            assert int(arena.count[ch[a]]) == node.count
            assert float(arena.value[ch[a]]) == node.value


def test_mcts_parity_deep_tree():
    """Longer run (80 episodes, horizon 8): deeper descents, value-driven tie
    sets, subtree re-expansion — still bit-exact."""
    sys.path.insert(0, "/root/reference")
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    with enable_x64():
        env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
        env.reset(seed=0)
        planner = MCTS(env.fork(), MCTSAgent.random_policy, MCTSAgent.random_policy,
                       {"episodes": 80, "horizon": 8, "gamma": GAMMA,
                        "temperature": TEMPERATURE, "closed_loop": False,
                        "step_strategy": "reset", "budget": 640})
        planner.seed(1)
        planner.step_by_reset()
        ref_actions = [int(a) for a in planner.plan(state=env.fork(), observation=None)]

        stream, inc = pcg64_init(1)
        actions, length, arena, _, _ = mcts_plan_parity(
            env.functional, env.params, env.state, stream, inc,
            num_actions=3, episodes=80, horizon=8,
            gamma=GAMMA, temperature=TEMPERATURE)
        assert [int(a) for a in np.asarray(actions)[:int(length)]] == ref_actions
        assert float(arena.value[0]) == planner.root.value
        assert int(arena.count[0]) == planner.root.count == 80


def test_mcts_parity_stream_consumption_differs_by_seed():
    """Different seeds must produce different draw streams (sanity that the
    RNG is actually consulted, not bypassed)."""
    with enable_x64():
        env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
        env.reset(seed=0)
        values = set()
        for seed in (0, 3, 7):
            stream, inc = pcg64_init(seed)
            _, _, arena, out_stream, _ = mcts_plan_parity(
                env.functional, env.params, env.state, stream, inc,
                num_actions=3, episodes=EPISODES, horizon=HORIZON,
                gamma=GAMMA, temperature=TEMPERATURE)
            values.add(tuple(np.asarray(out_stream.digits).tolist()))
        assert len(values) == 3
