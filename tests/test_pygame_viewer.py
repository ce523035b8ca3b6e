"""Live pygame viewer + agent overlays, headless (SDL dummy driver).

Covers the reference's env-viewer agent-display hook
(reference: trainer/evaluation.py:100-109, agents/common/graphics.py:20-51):
``Evaluation(display_env=True, display_agent=True)`` creates the viewer,
registers the overlay callback, and renders one frame per env step.
"""
import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
pygame = pytest.importorskip("pygame")


def _make_cartpole():
    from rl_agents_tpu.envs.cartpole import make as make_cartpole

    return make_cartpole({})


def test_viewer_renders_cartpole_frame():
    from rl_agents_tpu.graphics.pygame_viewer import PygameViewer

    env = _make_cartpole()
    env.reset(seed=0)
    viewer = PygameViewer(env, size=(160, 60), headless=True)
    frame = viewer.display()
    assert frame.shape == (120, 160, 3) and frame.dtype == np.uint8
    assert frame.max() > 0  # something was drawn
    viewer.close()


def test_viewer_renders_highway_frame():
    from rl_agents_tpu.envs.highway import make as make_highway
    from rl_agents_tpu.graphics.pygame_viewer import PygameViewer

    env = make_highway({"vehicles_count": 6})
    env.reset(seed=0)
    viewer = PygameViewer(env, size=(160, 60), headless=True)
    frame = viewer.display()
    assert frame.shape == (120, 160, 3)
    assert frame.max() > 0
    viewer.close()


def test_evaluation_wires_agent_overlay_tree_agent(tmpdir):
    """The overlay path of the reference harness: evaluation creates the
    viewer, hooks the agent display, and each step draws both surfaces."""
    from rl_agents_tpu.factory import agent_factory
    from rl_agents_tpu.trainer.evaluation import Evaluation

    env = _make_cartpole()
    agent = agent_factory(env, {"__class__": "MCTSAgent", "budget": 8,
                                "horizon": 4})
    evaluation = Evaluation(env, agent, directory=str(tmpdir), num_episodes=1,
                            sim_seed=0, display_env=True, display_agent=True)
    assert evaluation.viewer is not None
    assert evaluation.viewer.agent_display is not None
    evaluation.run_episodes()
    # agent surface was painted by the tree overlay (non-black pixels)
    frame = evaluation.viewer.get_image()
    agent_half = frame[frame.shape[0] // 2:]
    assert agent_half.max() > 0
    evaluation.close()


def test_evaluation_wires_agent_overlay_dqn(tmpdir):
    from rl_agents_tpu.agents.dqn.agent import DQNAgent
    from rl_agents_tpu.trainer.evaluation import Evaluation

    env = _make_cartpole()
    agent = DQNAgent(env, {"model": {"type": "MultiLayerPerceptron",
                                     "layers": [8]},
                           "batch_size": 4, "memory_capacity": 64})
    evaluation = Evaluation(env, agent, directory=str(tmpdir), num_episodes=1,
                            sim_seed=0, display_env=True, display_agent=True)
    assert evaluation.viewer is not None
    evaluation.training = False
    evaluation.run_episodes()
    frame = evaluation.viewer.get_image()
    assert frame.shape[2] == 3
    evaluation.close()
