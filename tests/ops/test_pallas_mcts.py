"""Pallas MCTS kernel: algorithmic correctness in interpret mode.

(Mosaic TPU compilation of the full tree machinery is blocked on backend
limitations recorded in STATUS.md; the kernel is validated on the Pallas
interpreter, and the env-transition sub-kernel compiles on TPU.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.finite_mdp import FiniteMDPEnv, params_from_config
from rl_agents_tpu.ops.pallas_mcts import make_mcts_kernel


def test_pallas_mcts_finds_rewarding_arm():
    _, mparams = params_from_config({
        "mode": "deterministic", "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]], "terminal": [0, 0]})

    class MEnv(FiniteMDPEnv):
        def default_params(self):
            return mparams

    env = MEnv(2, 2)
    B = 256  # two lane-blocks
    states, _ = jax.vmap(env.reset, in_axes=(None, 0))(
        mparams, jax.random.split(jax.random.PRNGKey(1), B))
    plan, n_nodes = make_mcts_kernel(env, jax.tree.map(lambda x: x[0], states),
                                     num_actions=2, episodes=23, horizon=8,
                                     gamma=0.8, temperature=5.0, interpret=True)
    actions = plan(states, jnp.arange(B))
    assert n_nodes == 1 + 23 * 2
    assert float((np.asarray(actions) == 1).mean()) == 1.0
