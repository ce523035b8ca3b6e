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


def test_ego_attention_policy_exports(tmp_path):
    """The flagship highway EgoAttentionNetwork exports/serves the same way."""
    from rl_agents_tpu.envs.highway import make as make_highway

    env = make_highway({"vehicles_count": 8, "lanes_count": 3})
    agent = DQNAgent(env, {"model": {
        "type": "EgoAttentionNetwork", "embedding_layer": {"layers": [32, 32]},
        "others_embedding_layer": {"layers": [32, 32]},
        "attention_layer": {"feature_size": 32, "heads": 2},
        "output_layer": {"layers": [32]}}})
    agent.seed(0)
    policy = load_policy(save_policy(agent, tmp_path / "ego.stablehlo"))
    obs, _ = env.reset(seed=0)
    actions, q = policy(np.asarray(obs)[None])
    assert q.shape == (1, 5)
    np.testing.assert_allclose(np.asarray(q[0]),
                               agent.get_state_action_values(np.asarray(obs)),
                               rtol=1e-5, atol=1e-6)


def test_planner_exports_as_artifact(tmp_path):
    """Planning-as-a-service: a fused MCTS plan-batch (env baked in) exports
    as one StableHLO artifact and returns identical plans when served."""
    import jax.numpy as jnp
    from jax import export as jax_export

    from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch
    from rl_agents_tpu.envs.cartpole import CartPoleEnv

    env = CartPoleEnv(max_episode_steps=200)
    params = env.default_params()
    probs = jnp.ones(2) / 2
    B = 16

    @jax.jit
    def plan(states, keys):
        action, values, _ = mcts_plan_batch(env, params, states, keys, probs,
                                            probs, 2, 6, 4, 0.95, 40.0)
        return action, values

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    direct_action, direct_values = plan(states, keys)

    from rl_agents_tpu.serving import register_pytree_serialization

    register_pytree_serialization(states)
    exported = jax_export.export(plan)(
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), states),
        jax.ShapeDtypeStruct(keys.shape, keys.dtype))
    blob = exported.serialize()
    (tmp_path / "planner.stablehlo").write_bytes(blob)
    served = jax_export.deserialize((tmp_path / "planner.stablehlo").read_bytes())
    served_action, served_values = served.call(states, keys)
    np.testing.assert_array_equal(np.asarray(served_action),
                                  np.asarray(direct_action))
    np.testing.assert_allclose(np.asarray(served_values),
                               np.asarray(direct_values), rtol=1e-6)
