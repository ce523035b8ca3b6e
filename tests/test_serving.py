"""Policy export/serving: StableHLO artifacts round-trip without the
framework (rl_agents_tpu/serving.py; the reference's analog is a pickled
torch module needing its class definitions at load time)."""
import jax
import numpy as np

from rl_agents_tpu.agents.dqn.agent import DQNAgent
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.serving import load_policy, save_policy


def _agent():
    env = make_cartpole({})
    agent = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron",
                                     "layers": [16, 16]}})
    agent.seed(0)
    return agent


def test_exported_policy_matches_agent(tmp_path):
    agent = _agent()
    path = save_policy(agent, tmp_path / "policy.stablehlo")
    policy = load_policy(path)
    rng = np.random.default_rng(0)
    obs = rng.standard_normal((5, 4)).astype(np.float32)
    actions, q = policy(obs)
    assert actions.shape == (5,) and q.shape == (5, 2)
    for i in range(5):
        np.testing.assert_allclose(np.asarray(q[i]),
                                   agent.get_state_action_values(obs[i]),
                                   rtol=1e-5, atol=1e-6)
        assert int(actions[i]) == int(np.argmax(np.asarray(q[i])))


def test_exported_policy_symbolic_batch(tmp_path):
    """One artifact serves any batch size (symbolic batch dimension)."""
    agent = _agent()
    policy = load_policy(save_policy(agent, tmp_path / "p.stablehlo"))
    for batch in (1, 7, 64):
        actions, q = policy(np.zeros((batch, 4), np.float32))
        assert actions.shape == (batch,) and q.shape == (batch, 2)


def test_exported_policy_is_jit_composable(tmp_path):
    """The artifact participates in jit/vmap-of-call like any jax fn."""
    agent = _agent()
    policy = load_policy(save_policy(agent, tmp_path / "p.stablehlo"))

    @jax.jit
    def serve(obs):
        actions, q = policy.exported.call(obs)
        return actions, q.max(axis=-1)

    actions, values = serve(np.zeros((3, 4), np.float32))
    assert actions.shape == (3,) and values.shape == (3,)
