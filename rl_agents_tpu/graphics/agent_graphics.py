"""Agent observability graphics.

Rebuild of the reference's agent display stack (common/graphics.py:20-51
isinstance dispatch; deep_q_network/graphics.py:10-164 value bars, attention
heatmaps and value-function maps; budgeted_ftq/graphics.py frontier plots).
Matplotlib/host-side, off the hot path; figures can go to a TensorBoard
writer or be saved.
"""
from __future__ import annotations

import numpy as np


class AgentGraphics:
    """isinstance-dispatch of agent visualisations (reference: common/graphics.py:20-51)."""

    @classmethod
    def display(cls, agent, writer=None, epoch: int = 0):
        from rl_agents_tpu.agents.dqn.agent import DQNAgent
        from rl_agents_tpu.agents.dynamic_programming.value_iteration import (
            ValueIterationAgent,
        )
        from rl_agents_tpu.agents.robust.robust_epc import RobustEPCAgent
        from rl_agents_tpu.agents.tree_search.common import AbstractTreeSearchAgent

        if isinstance(agent, DQNAgent):
            return DQNGraphics.display(agent, writer, epoch)
        elif isinstance(agent, ValueIterationAgent):
            return ValueIterationGraphics.display(agent, writer, epoch)
        elif isinstance(agent, RobustEPCAgent):
            from rl_agents_tpu.graphics.robust_graphics import RobustEPCGraphics

            return RobustEPCGraphics.display_ellipsoids(agent, writer, epoch)
        elif isinstance(agent, AbstractTreeSearchAgent) and agent.last_plan_data is not None:
            from rl_agents_tpu.graphics.tree_plot import TreePlot

            return TreePlot(agent.last_plan_data).plot_to_writer(writer, epoch)
        return None


class DQNGraphics:
    """Q-value bars + attention heatmap (reference: deep_q_network/graphics.py:10-90)."""

    @classmethod
    def display(cls, agent, writer=None, epoch: int = 0, state=None):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        state = state if state is not None else agent.previous_state
        if state is None:
            return None
        values = agent.get_state_action_values(np.asarray(state))
        fig, ax = plt.subplots()
        ax.bar(range(len(values)), values)
        ax.set_xlabel("action")
        ax.set_ylabel("Q value")
        if writer is not None:
            try:
                writer.add_figure("agent/q_values", fig, epoch)
            except AttributeError:
                pass
        plt.close(fig)
        return fig

    @classmethod
    def attention_matrix(cls, agent, state):
        """Attention weights over entities for attention Q-networks
        (reference: compute_vehicles_attention, deep_q_network/graphics.py:92-130)."""
        import jax.numpy as jnp

        model = agent.model
        if not hasattr(model, "get_attention_matrix"):
            return None
        x = jnp.asarray(np.asarray(state), jnp.float32)[None]
        att = model.apply(agent.train_state.params, x, method=model.get_attention_matrix)
        return np.asarray(att)[0]


class ValueIterationGraphics:
    """Q-table heatmap for finite-MDP agents
    (reference: dynamic_programming/graphics.py:8-62)."""

    @classmethod
    def display(cls, agent, writer=None, epoch: int = 0):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        q = np.asarray(agent.state_action_value)
        fig, ax = plt.subplots()
        mesh = ax.pcolormesh(q.T, shading="auto", cmap="viridis")
        fig.colorbar(mesh, label="Q(s, a)")
        ax.set_xlabel("state")
        ax.set_ylabel("action")
        if writer is not None:
            try:
                writer.add_figure("agent/q_table", fig, epoch)
            except AttributeError:
                pass
        plt.close(fig)
        return fig


class ValueFunctionViewer:
    """Value maps over a state mesh (reference: deep_q_network/graphics.py:132-164
    + trainer/state_sampler.py)."""

    def __init__(self, agent, state_sampler):
        self.agent = agent
        self.sampler = state_sampler

    def plot_to_writer(self, writer=None, epoch: int = 0):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xx, yy, states = self.sampler.states_mesh()
        values, _ = self.agent.get_batch_state_values(states)
        fig, ax = plt.subplots()
        mesh = ax.pcolormesh(xx, yy, values.reshape(xx.shape), shading="auto")
        fig.colorbar(mesh)
        if writer is not None:
            try:
                writer.add_figure("agent/value_function", fig, epoch)
            except AttributeError:
                pass
        plt.close(fig)
        return fig


class BFTQGraphics:
    """Pareto frontier plot (reference: budgeted_ftq/graphics.py:22-60)."""

    @classmethod
    def display_frontier(cls, agent, state, writer=None, epoch: int = 0):
        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rl_agents_tpu.agents.budgeted_ftq.greedy_policy import (
            frontier_values,
            pareto_frontier,
        )

        bftq = agent.bftq
        betas = bftq.betas_for_discretisation
        B = betas.shape[0]
        sb = jnp.concatenate([
            jnp.tile(jnp.asarray(np.asarray(state).flatten(), jnp.float32)[None], (B, 1)),
            betas[:, None]], axis=1)
        q = bftq.network.apply(bftq.params, sb)
        qr, qc, actions, budgets = frontier_values(q, betas)
        f = pareto_frontier(qr, qc, actions, budgets)
        n = int(f.count)
        fig, ax = plt.subplots()
        ax.scatter(np.asarray(qc), np.asarray(qr), s=10, alpha=0.5, label="points")
        ax.plot(np.asarray(f.qc[:n]), np.asarray(f.qr[:n]), "r-o", label="frontier")
        ax.set_xlabel("Qc")
        ax.set_ylabel("Qr")
        ax.legend()
        if writer is not None:
            try:
                writer.add_figure("agent/frontier", fig, epoch)
            except AttributeError:
                pass
        plt.close(fig)
        return fig
