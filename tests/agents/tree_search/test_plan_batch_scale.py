"""4096-tree batch smoke tests for every arena planner (VERDICT r1 item 5).

Each planner is a pure jitted arena program; a tree batch is one vmap. These
tests run the full lineup the reference study sweeps
(reference: scripts/planners_evaluation.py:53-124) at 4096 trees on the CPU
mesh, asserting shapes, action validity, and cross-tree consistency where
trees share identical inputs. The hash-table planners (GBOP family,
state-aware, DPW) carry per-tree tables on the batch axis.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.agents.tree_search.batch import (
    brue_plan_batch,
    gbop_plan_batch,
    gbop_stochastic_plan_batch,
    mcts_dpw_plan_batch,
    mdp_gape_plan_batch,
    olop_plan_batch,
    sparse_sampling_plan_batch,
    state_aware_plan_batch,
)
from rl_agents_tpu.envs.finite_mdp import make as make_mdp

B = 4096
LOOP_CONFIG = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}


@pytest.fixture(scope="module")
def env_batch():
    env = make_mdp(dict(LOOP_CONFIG, max_episode_steps=1000))
    env.reset(seed=0)
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
                           env.state)
    obs0 = jnp.broadcast_to(jnp.asarray(env.obs), (B,) + jnp.shape(env.obs))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    return env, states0, obs0, keys


def test_olop_plan_batch_scale(env_batch):
    env, states0, _, keys = env_batch
    actions, lengths, trees = olop_plan_batch(
        env.functional, env.params, states0, keys,
        num_actions=3, episodes=10, horizon=3, gamma=0.8, threshold_coeff=4.0)
    assert actions.shape[0] == B
    valid = np.asarray(actions)[np.asarray(actions) >= 0]
    assert valid.size and valid.max() < 3
    # same start state: identical root bounds across the batch (draw-free)
    np.testing.assert_allclose(np.asarray(trees.value_upper[:, 0]),
                               np.asarray(trees.value_upper[0, 0]), rtol=1e-6)


def test_brue_plan_batch_scale(env_batch):
    env, states0, _, keys = env_batch
    actions, _ = brue_plan_batch(env.functional, env.params, states0, keys,
                                 num_actions=3, budget=20, horizon=3,
                                 gamma=0.8, width=4)
    assert actions.shape == (B,)
    assert int(np.asarray(actions).max()) < 3


def test_mdp_gape_plan_batch_scale(env_batch):
    env, states0, _, keys = env_batch
    best, episodes_used, _ = mdp_gape_plan_batch(
        env.functional, env.params, states0, keys,
        num_actions=3, episodes=8, horizon=2, gamma=0.8, accuracy=0.5,
        confidence=0.9, transition_threshold_coeff=1.0, width=2)
    assert best.shape == (B,)
    assert int(np.asarray(best).max()) < 3


def test_sparse_sampling_plan_batch_scale(env_batch):
    env, states0, _, keys = env_batch
    actions, q_root = sparse_sampling_plan_batch(
        env.functional, env.params, states0, keys,
        num_actions=3, horizon=2, samples=2, gamma=0.8)
    assert actions.shape == (B,)
    assert q_root.shape == (B, 3)
    # deterministic MDP: identical Q estimates regardless of sample keys
    np.testing.assert_allclose(
        np.asarray(q_root),
        np.broadcast_to(np.asarray(q_root[0]), (B, 3)), rtol=1e-6)


def test_mcts_dpw_plan_batch_scale(env_batch):
    env, states0, _, keys = env_batch
    probs = jnp.ones(3) / 3
    action, _ = mcts_dpw_plan_batch(
        env.functional, env.params, states0, keys, probs,
        num_actions=3, episodes=10, horizon=3, gamma=0.8, temperature=5.0,
        k_action=1.0, alpha_action=0.5, k_state=1.0, alpha_state=0.5, width=4)
    assert action.shape == (B,)
    assert int(np.asarray(action).max()) < 3


def test_gbop_plan_batch_scale(env_batch):
    env, states0, obs0, keys = env_batch
    actions, lengths, graphs = gbop_plan_batch(
        env.functional, env.params, states0, obs0, keys,
        num_actions=3, expansions=8, gamma=0.8)
    assert actions.shape[0] == B
    # state aggregation: the 4-state loop MDP collapses to <= 4 graph nodes
    assert int(np.asarray(graphs.used).max()) <= 5
    np.testing.assert_allclose(np.asarray(graphs.value_lower[:, 0]),
                               np.asarray(graphs.value_lower[0, 0]), rtol=1e-6)


def test_gbop_stochastic_plan_batch_scale(env_batch):
    env, states0, obs0, keys = env_batch
    action, _ = gbop_stochastic_plan_batch(
        env.functional, env.params, states0, obs0, keys,
        num_actions=3, episodes=8, horizon=3, gamma=0.8, accuracy=0.1,
        reward_threshold_coeff=1.0, transition_threshold_coeff=1.0,
        width=1, vi_sweeps=10)
    assert action.shape == (B,)
    assert int(np.asarray(action).max()) < 3


def test_state_aware_plan_batch_scale(env_batch):
    env, states0, obs0, keys = env_batch
    actions, lengths, trees = state_aware_plan_batch(
        env.functional, env.params, states0, obs0, keys,
        num_actions=3, expansions=8, gamma=0.8)
    assert actions.shape[0] == B
    valid = np.asarray(actions)[np.asarray(actions) >= 0]
    assert valid.size and valid.max() < 3
