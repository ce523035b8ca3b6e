"""Dev driver: compile the Pallas MCTS kernel on the real TPU and report.

Usage: python scripts/dev_pallas_compile.py [cartpole|highway|mdp]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.ops.pallas_mcts import make_mcts_kernel

which = sys.argv[1] if len(sys.argv) > 1 else "mdp"

if which == "mdp":
    from rl_agents_tpu.envs.finite_mdp import FiniteMDPEnv, params_from_config
    _, mparams = params_from_config({
        "mode": "deterministic", "transition": [[0, 1], [0, 1]],
        "reward": [[0.0, 1.0], [0.0, 1.0]], "terminal": [0, 0]})

    class MEnv(FiniteMDPEnv):
        def default_params(self):
            return mparams

    env = MEnv(2, 2)
    A = 2
elif which == "highway":
    from rl_agents_tpu.envs.highway import HighwayEnv
    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    A = 5
else:
    raise SystemExit(f"unknown env {which}")

params = env.default_params()
B = 256
states, _ = jax.vmap(env.reset, in_axes=(None, 0))(
    params, jax.random.split(jax.random.PRNGKey(1), B))
plan, n_nodes = make_mcts_kernel(env, jax.tree.map(lambda x: x[0], states),
                                 num_actions=A, episodes=23, horizon=8,
                                 gamma=0.95, temperature=40.0, interpret=False)
t0 = time.time()
actions = jax.block_until_ready(plan(states, jnp.arange(B)))
print(f"COMPILED+RAN in {time.time()-t0:.1f}s; actions histogram:",
      np.bincount(np.asarray(actions), minlength=A))
