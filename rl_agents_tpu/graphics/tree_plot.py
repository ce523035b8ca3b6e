"""Tree visualisation from node arenas.

Rebuild of the reference TreePlot (tree_search/graphics.py:101-166): renders
the expanded search tree with matplotlib (value-colored edges) and can push
the figure to a TensorBoard writer. Works on any arena pytree exposing
``children`` [N, A] plus a per-node value array.
"""
from __future__ import annotations

import numpy as np


def _node_value(tree, idx):
    for field in ("value_upper", "value", "value_lower", "d_value_upper"):
        arr = getattr(tree, field, None)
        if arr is not None:
            v = np.asarray(arr)
            if v.ndim == 1:
                return float(v[idx])
            return float(v[idx].min())
    return 0.0


class TreePlot:
    def __init__(self, tree, max_depth: int = 6):
        self.tree = tree
        self.max_depth = max_depth
        self.children = np.asarray(getattr(tree, "children", getattr(tree, "d_children", None)))

    def plot(self, ax, node=0, x=0.0, y=0.0, width=2.0, depth=0):
        if depth > self.max_depth or self.children is None:
            return
        ch = self.children[node]
        valid = [int(c) for c in ch if c >= 0]
        if not valid:
            return
        import matplotlib.cm as cm

        n = len(valid)
        for i, child in enumerate(valid):
            cx = x - width / 2 + (i + 0.5) * width / n
            cy = y - 1
            value = _node_value(self.tree, child)
            color = cm.jet(min(max(value / 5.0, 0.0), 1.0))
            ax.plot([x, cx], [y, cy], color=color, linewidth=1)
            self.plot(ax, child, cx, cy, width / n, depth + 1)

    def plot_to_writer(self, writer, epoch: int = 0, figsize=(8, 6), show=False):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        ax.axis("off")
        self.plot(ax)
        if writer is not None:
            try:
                writer.add_figure("planner/tree", fig, epoch)
            except AttributeError:
                pass
        if show:
            plt.show()
        plt.close(fig)
        return fig
