"""Bridge-path pinning on the env packages that ARE installed (VERDICT r4
item 8): recorded-trace golden fixtures for the gym bridge, and
bridge-vs-functional DECISION parity on a real installed env beyond
CartPole's observation layout.

The highway_env bridge cross-check remains environment-gated
(tests/envs/test_highway_bridge_parity.py importorskips it); these tests
keep the same GymBridge code path exercised against real gymnasium physics
in every image.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from rl_agents_tpu.envs.bridge import GymBridge, make_gym_env
from rl_agents_tpu.factory import load_agent, load_environment

FIXTURE = Path(__file__).resolve().parents[1] / "data" / "bridge_traces.json"


@pytest.mark.parametrize("env_id", ["CartPole-v1", "MountainCar-v0",
                                    "Acrobot-v1"])
def test_bridge_replays_recorded_trace(env_id):
    """GymBridge must reproduce the committed golden trace step-for-step:
    pins observation layout, reward, termination and seeding semantics of
    the bridge (reference factory.py:59-94 loads envs exactly this way)."""
    trace = json.loads(FIXTURE.read_text())[env_id]
    bridge = make_gym_env({"id": env_id})
    obs, _ = bridge.reset(seed=7)
    np.testing.assert_allclose(np.asarray(obs, np.float64), trace[0]["obs"],
                               rtol=1e-7, atol=1e-9)
    for rec in trace[1:]:
        obs, reward, term, trunc, _ = bridge.step(rec["action"])
        np.testing.assert_allclose(np.asarray(obs, np.float64), rec["obs"],
                                   rtol=1e-7, atol=1e-9)
        assert float(reward) == rec["reward"]
        assert bool(term) == rec["terminated"]
        assert bool(trunc) == rec["truncated"]


def test_bridge_fork_is_independent():
    """fork() must deep-copy: stepping the fork leaves the original's state
    untouched (the reference's safe_deepcopy_env contract)."""
    bridge = make_gym_env({"id": "MountainCar-v0"})
    bridge.reset(seed=3)
    state_before = np.array(bridge.env.unwrapped.state, np.float64)
    fork = bridge.fork()
    for _ in range(5):
        fork.step(2)
    np.testing.assert_array_equal(
        np.array(bridge.env.unwrapped.state, np.float64), state_before)
    assert not np.allclose(np.array(fork.env.unwrapped.state, np.float64),
                           state_before)


def test_bridge_functional_decision_parity_mountaincar():
    """Decision parity through the bridge on a real installed env with a
    non-CartPole observation layout: a fixed-seed DQN policy must choose
    the SAME greedy action at every step whether it observes the real
    gymnasium MountainCar through GymBridge or the functional surrogate,
    stepped in lockstep from the matched initial state."""
    import jax.numpy as jnp

    func = load_environment({"id": "mountaincar"})
    func.reset(seed=0)
    bridge = make_gym_env({"id": "MountainCar-v0"})
    bridge.reset(seed=0)
    bridge.env.unwrapped.state = np.array(
        [float(func.state.position), float(func.state.velocity)])

    agent = load_agent({"__class__": "DQNAgent",
                        "model": {"layers": [32, 32]}}, func)
    agent.seed(0)
    agent.eval()  # greedy decisions, deterministic given the observation

    state = func.state
    obs_f = np.asarray(func.functional.observe(func.params, state))
    obs_b = np.asarray(bridge.env.unwrapped.state, np.float32)
    for t in range(40):
        np.testing.assert_allclose(obs_f, obs_b, rtol=1e-5, atol=1e-6)
        a_f = int(agent.act(obs_f))
        a_b = int(agent.act(obs_b))
        assert a_f == a_b, f"step {t}: functional {a_f} vs bridge {a_b}"
        out = func.functional.step(func.params, state, a_f, func.key)
        obs_b, _, term, trunc, _ = bridge.step(a_f)
        obs_b = np.asarray(obs_b, np.float32)
        state = out.state
        obs_f = np.asarray(out.obs)
        if term or trunc:
            break
