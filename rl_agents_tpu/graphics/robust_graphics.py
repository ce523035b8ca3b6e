"""Robust-agent visualisations.

Rebuild of the reference robust graphics (robust/graphics/*.py, ~360 LoC):
confidence-ellipsoid plots for EPC estimation and interval-trajectory
envelopes from the LPV predictor. Matplotlib, host-side.
"""
from __future__ import annotations

import numpy as np


class RobustEPCGraphics:
    @classmethod
    def display_ellipsoids(cls, agent, writer=None, epoch: int = 0, resolution: int = 60):
        """Plot the evolution of the parameter confidence ellipsoids
        {theta : (theta - theta_hat)^T G (theta - theta_hat) <= beta^2}."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        history = agent.ellipsoids[:: max(len(agent.ellipsoids) // 10, 1)]
        for i, (theta, g, beta) in enumerate(history):
            alpha = min(0.2 + 0.8 * i / max(len(history) - 1, 1), 1.0)
            if theta.shape[0] == 1:
                radius = beta / np.sqrt(max(float(np.ravel(g)[0]), 1e-9))
                ax.plot([theta[0] - radius, theta[0] + radius], [i, i],
                        "-o", alpha=alpha, color="tab:blue", markersize=2)
            else:
                t = np.linspace(0, 2 * np.pi, resolution)
                circle = np.stack([np.cos(t), np.sin(t)])
                values, vectors = np.linalg.eigh(g[:2, :2])
                ell = theta[:2, None] + vectors @ np.diag(
                    beta / np.sqrt(np.maximum(values, 1e-9))) @ circle
                ax.plot(ell[0], ell[1], alpha=alpha, color="tab:blue")
        ax.set_xlabel("theta[0]")
        ax.set_ylabel("update" if len(history) and history[0][0].shape[0] == 1 else "theta[1]")
        if writer is not None:
            try:
                writer.add_figure("agent/ellipsoids", fig, epoch)
            except AttributeError:
                pass
        plt.close(fig)
        return fig

    @classmethod
    def display_interval_trajectory(cls, lpv, controls, dt, writer=None, epoch: int = 0):
        """Interval envelope of the predicted trajectory
        (the reference's interval overlays on the sim surface)."""
        import jax.numpy as jnp
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from rl_agents_tpu.robust.interval import lpv_trajectory

        lo, hi = lpv_trajectory(lpv, jnp.asarray(controls), dt)
        lo, hi = np.asarray(lo), np.asarray(hi)
        steps = np.arange(lo.shape[0])
        fig, ax = plt.subplots()
        for dim in range(lo.shape[1]):
            ax.fill_between(steps, lo[:, dim], hi[:, dim], alpha=0.3,
                            label=f"x[{dim}] interval")
        ax.set_xlabel("step")
        ax.set_ylabel("state")
        ax.legend()
        if writer is not None:
            try:
                writer.add_figure("agent/interval_trajectory", fig, epoch)
            except AttributeError:
                pass
        plt.close(fig)
        return fig
