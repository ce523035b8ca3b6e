"""Graphics smoke tests (figures render without a display)."""
import numpy as np

from rl_agents_tpu.graphics.agent_graphics import AgentGraphics, DQNGraphics
from rl_agents_tpu.graphics.robust_graphics import RobustEPCGraphics
from rl_agents_tpu.graphics.render import CartPoleRenderer, HighwayRenderer
from rl_agents_tpu.trainer.state_sampler import CartPoleStateSampler


def test_dqn_graphics_and_value_viewer():
    from rl_agents_tpu.agents.dqn.agent import DQNAgent
    from rl_agents_tpu.envs.cartpole import make as make_cartpole
    from rl_agents_tpu.graphics.agent_graphics import ValueFunctionViewer

    env = make_cartpole({})
    agent = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron", "layers": [8]}})
    agent.previous_state = np.zeros(4)
    assert DQNGraphics.display(agent) is not None
    assert AgentGraphics.display(agent) is not None
    viewer = ValueFunctionViewer(agent, CartPoleStateSampler(resolution=5))
    assert viewer.plot_to_writer() is not None


def test_attention_matrix_extraction():
    import jax.numpy as jnp

    from rl_agents_tpu.agents.dqn.agent import DQNAgent
    from rl_agents_tpu.envs.highway import make as make_highway

    env = make_highway({"vehicles_count": 6})
    agent = DQNAgent(env, {"model": {
        "type": "EgoAttentionNetwork",
        "embedding_layer": {"layers": [16]}, "others_embedding_layer": {"layers": [16]},
        "attention_layer": {"feature_size": 16, "heads": 2},
        "output_layer": {"layers": [16]}}})
    obs, _ = env.reset(seed=0)
    att = DQNGraphics.attention_matrix(agent, obs)
    assert att.shape == (2, 1, 6)  # heads x ego x entities


def test_epc_ellipsoid_plot():
    from rl_agents_tpu.agents.robust.robust_epc import RobustEPCAgent
    from rl_agents_tpu.envs.linear import make as make_linear

    env = make_linear({})
    agent = RobustEPCAgent(env, {
        "A": [[0.0, 1.0], [0.0, 0.0]], "B": [[0.0], [1.0]], "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]], "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 6}})
    obs, _ = env.reset(seed=0)
    for _ in range(3):
        obs, *_ = env.step(1)
        agent.record_transition(np.asarray(obs["state"]), np.asarray(obs["derivative"]),
                                np.array([1.0]))
    assert RobustEPCGraphics.display_ellipsoids(agent) is not None


def test_renderers():
    from rl_agents_tpu.envs.cartpole import make as make_cartpole
    from rl_agents_tpu.envs.highway import make as make_highway

    cp = make_cartpole({})
    cp.reset(seed=0)
    frame = CartPoleRenderer().render(cp)
    assert frame.ndim == 3 and frame.shape[2] == 3
    hw = make_highway({"vehicles_count": 5})
    hw.reset(seed=0)
    frame = HighwayRenderer().render(hw)
    assert frame.ndim == 3


def test_vi_q_table_heatmap():
    from rl_agents_tpu.agents.dynamic_programming.value_iteration import ValueIterationAgent
    from rl_agents_tpu.envs.finite_mdp import make as make_mdp
    from rl_agents_tpu.graphics.agent_graphics import ValueIterationGraphics

    env = make_mdp({"mode": "deterministic",
                    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
                    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
                    "terminal": [0, 0, 0, 0]})
    agent = ValueIterationAgent(env, {"gamma": 0.9})
    assert ValueIterationGraphics.display(agent) is not None
    assert AgentGraphics.display(agent) is not None
