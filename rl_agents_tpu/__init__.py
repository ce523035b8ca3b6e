"""rl_agents_tpu: a TPU-native planner/trainer framework.

A from-scratch JAX/XLA rebuild of the capabilities of eleurent/rl-agents:
implementations of planning algorithms (MCTS/UCT, OPD, OLOP, MDP-GapE, BRUE,
sparse sampling, graph-based planners, CEM), dynamic programming (VI, robust
VI), value-based learners (DQN, Fitted-Q, Budgeted Fitted-Q), and safe/robust
control — built on functional environments, array-encoded search trees, and
sharded multi-chip execution instead of env deep-copies and process pools.
"""

__version__ = "0.1.0"

import os as _os

if "JAX_PLATFORMS" in _os.environ:
    # Restore the documented JAX_PLATFORMS env-var semantics: some images
    # (this one's axon sitecustomize) override platform selection
    # programmatically after registering accelerator plugins, which silently
    # ignores the user's env var. Respect it again.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
