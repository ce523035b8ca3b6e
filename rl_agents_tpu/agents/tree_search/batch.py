"""Tree-batch axes for every arena planner.

The reference parallelizes planner studies by forking worker processes, one
env per process (reference: scripts/planners_evaluation.py:294-295). Here
every planner is a pure jitted program over fixed-capacity arenas, so a batch
of B independent trees is one ``vmap`` — thousands of trees per chip, and the
batch axis shards over a device mesh via
``parallel.mesh.sharded_planner_batch`` unchanged.

All wrappers share the convention: leading batch axis on ``states0`` (and
``obs0`` where the planner aggregates by observation) and ``keys``;
``params`` and the scalar configuration are broadcast. Returns match the
single-tree planner with a leading batch axis.
"""
from __future__ import annotations

import jax

from rl_agents_tpu.agents.tree_search.brue import brue_plan
from rl_agents_tpu.agents.tree_search.graph_based import gbop_plan
from rl_agents_tpu.agents.tree_search.graph_based_stochastic import gbop_stochastic_plan
from rl_agents_tpu.agents.tree_search.mcts_dpw import mcts_dpw_plan
from rl_agents_tpu.agents.tree_search.mdp_gape import mdp_gape_plan
from rl_agents_tpu.agents.tree_search.olop import olop_plan
from rl_agents_tpu.agents.tree_search.sparse_sampling import sparse_sampling_plan
from rl_agents_tpu.agents.tree_search.state_aware import state_aware_plan


def _batch(plan_fn, env, params, states0, keys, **kw):
    return jax.vmap(lambda s, k: plan_fn(env, params, s, k, **kw))(states0, keys)


def _batch_obs(plan_fn, env, params, states0, obs0, keys, **kw):
    return jax.vmap(lambda s, o, k: plan_fn(env, params, s, o, k, **kw))(
        states0, obs0, keys)


def olop_plan_batch(env, params, states0, keys, **kw):
    """Batched KL-OLOP (reference: olop.py:11-200, swept by the study at
    scripts/planners_evaluation.py:53-124)."""
    return _batch(olop_plan, env, params, states0, keys, **kw)


def brue_plan_batch(env, params, states0, keys, **kw):
    """Batched BRUE (reference: brue.py:11-123)."""
    return _batch(brue_plan, env, params, states0, keys, **kw)


def mdp_gape_plan_batch(env, params, states0, keys, **kw):
    """Batched MDP-GapE (reference: mdp_gape.py:11-344)."""
    return _batch(mdp_gape_plan, env, params, states0, keys, **kw)


def sparse_sampling_plan_batch(env, params, states0, keys, **kw):
    """Batched sparse sampling (reference: sparse_sampling.py:11-103)."""
    return _batch(sparse_sampling_plan, env, params, states0, keys, **kw)


def mcts_dpw_plan_batch(env, params, states0, keys, rollout_probs, **kw):
    """Batched MCTS-DPW (reference: mcts_dpw.py:10-193). Per-tree obs-hash
    tables carry the batch axis like any other arena array."""
    return jax.vmap(
        lambda s, k: mcts_dpw_plan(env, params, s, k, rollout_probs, **kw))(
        states0, keys)


def gbop_plan_batch(env, params, states0, obs0, keys, **kw):
    """Batched GBOP-D (reference: graph_based.py:12-151). Each tree owns its
    obs-key aggregation table along the batch axis."""
    return _batch_obs(gbop_plan, env, params, states0, obs0, keys, **kw)


def gbop_stochastic_plan_batch(env, params, states0, obs0, keys, **kw):
    """Batched stochastic GBOP (reference: graph_based_stochastic.py:15-361)."""
    return _batch_obs(gbop_stochastic_plan, env, params, states0, obs0, keys, **kw)


def state_aware_plan_batch(env, params, states0, obs0, keys, **kw):
    """Batched state-aware OPD (reference: state_aware.py:10-137)."""
    return _batch_obs(state_aware_plan, env, params, states0, obs0, keys, **kw)


def mcts_closed_loop_plan_batch(env, params, states0, keys, prior_probs,
                                rollout_probs, **kw):
    """Batched closed-loop MCTS (reference: mcts.py:147,267-273): chance
    children keyed by observed outcomes, per-tree key tables on the batch
    axis."""
    from rl_agents_tpu.agents.tree_search.mcts_closed_loop import (
        mcts_closed_loop_plan,
    )

    return jax.vmap(
        lambda s, k: mcts_closed_loop_plan(env, params, s, k, prior_probs,
                                           rollout_probs, **kw))(states0, keys)
