"""Fused batched MCTS vs the vmapped reference-structured planner."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch_vmap
from rl_agents_tpu.agents.tree_search.mcts_fused import mcts_plan_batch_fused
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.envs.finite_mdp import make as make_mdp


def test_fused_finds_rewarding_arm():
    env = make_mdp({
        "mode": "deterministic", "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]], "terminal": [0, 0]})
    B = 64
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
                           env.functional.reset(env.params, jax.random.PRNGKey(0))[0])
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    probs = jnp.ones(2) / 2
    actions, lengths, tree = mcts_plan_batch_fused(
        env.functional, env.params, states0, keys, probs, probs,
        num_actions=2, episodes=23, horizon=8, gamma=0.8, temperature=5.0)
    assert actions.shape == (B, 8)
    np.testing.assert_array_equal(np.asarray(actions[:, 0]), 1)
    # root visited once per episode
    np.testing.assert_array_equal(np.asarray(tree.count[:, 0]), 23)
    assert np.all(np.asarray(lengths) >= 1)


def test_fused_matches_vmap_statistically():
    """Fused and vmapped planners agree on root-child visit shares (same
    algorithm, different RNG streams)."""
    env = make_cartpole({"max_episode_steps": 100})
    env.reset(seed=0)
    B = 48
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
                           env.state)
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    probs = jnp.ones(2) / 2
    kw = dict(num_actions=2, episodes=30, horizon=8, gamma=0.9, temperature=10.0)
    a1, l1, t1 = mcts_plan_batch_fused(env.functional, env.params, states0,
                                       keys, probs, probs, **kw)
    a2, l2, t2 = mcts_plan_batch_vmap(env.functional, env.params, states0,
                                      keys, probs, probs, **kw)
    # mean root value estimates agree across the batch
    v1 = float(jnp.mean(t1.value[:, 0]))
    v2 = float(jnp.mean(t2.value[:, 0]))
    assert abs(v1 - v2) / max(abs(v2), 1e-6) < 0.15
    # root action distribution agrees
    p1 = np.bincount(np.asarray(a1[:, 0]), minlength=2) / B
    p2 = np.bincount(np.asarray(a2[:, 0]), minlength=2) / B
    assert np.abs(p1 - p2).max() < 0.35


def test_fused_tree_view_structure():
    env = make_mdp({
        "mode": "deterministic", "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]], "terminal": [0, 0]})
    B = 8
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + jnp.shape(x)),
                           env.functional.reset(env.params, jax.random.PRNGKey(0))[0])
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    probs = jnp.ones(2) / 2
    _, _, tree = mcts_plan_batch_fused(
        env.functional, env.params, states0, keys, probs, probs,
        num_actions=2, episodes=10, horizon=6, gamma=0.9, temperature=2.0)
    ch = np.asarray(tree.children)
    par = np.asarray(tree.parent)
    # root children exist and point back at the root
    assert (ch[:, 0, 0] >= 0).all()
    for b in range(B):
        for a in range(2):
            assert par[b, ch[b, 0, a]] == 0
    # used counter matches expansion slots
    assert (np.asarray(tree.used) >= 3).all()
