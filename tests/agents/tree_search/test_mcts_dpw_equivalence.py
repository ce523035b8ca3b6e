"""Statistical equivalence of MCTS-DPW vs the reference (STATUS known-gap).

Double progressive widening interleaves env reseeds, uniform unexplored-action
draws, UCB tie-breaks and outcome-child draws through host object traversal,
so a one-to-one draw mapping is impractical; the parity bar is the same as
BRUE's: over many fixed seeds on the same stochastic MDP, the
recommended-action distribution of the array-encoded planner must match the
reference's within sampling tolerance (reference: mcts_dpw.py:58-175).
"""
import sys

import jax
import numpy as np

from rl_agents_tpu.agents.tree_search.mcts_dpw import mcts_dpw_plan
from rl_agents_tpu.envs.finite_mdp import make as make_mdp

# 4-state / 3-action stochastic MDP: actions 0 and 1 are near-tied (so the
# recommendation distribution is genuinely mixed and the test discriminates —
# with a clearly dominant action both planners trivially agree 100%);
# action 2 drifts toward the worthless state 3.
STOCH_CONFIG = {
    "mode": "stochastic",
    "transition": [
        [[0.7, 0.2, 0.1, 0.0], [0.3, 0.3, 0.3, 0.1], [0.1, 0.1, 0.3, 0.5]],
        [[0.6, 0.3, 0.1, 0.0], [0.2, 0.4, 0.3, 0.1], [0.0, 0.2, 0.3, 0.5]],
        [[0.5, 0.3, 0.2, 0.0], [0.2, 0.3, 0.4, 0.1], [0.1, 0.1, 0.3, 0.5]],
        [[0.3, 0.3, 0.2, 0.2], [0.1, 0.3, 0.3, 0.3], [0.0, 0.1, 0.2, 0.7]],
    ],
    "reward": [
        [0.55, 0.5, 0.0],
        [0.5, 0.55, 0.0],
        [0.4, 0.4, 0.0],
        [0.0, 0.0, 0.0],
    ],
    "terminal": [0, 0, 0, 0],
}
# measured at this config: 480-seed audit gives ref [328,151,1] vs ours
# [306,174,0], TV 0.048 — i.e. the true RNG-order offset is ~0.05. At 240
# seeds sigma_TV ~ 0.03, so the 0.15 bound is offset + ~3.3 sigma: stable,
# while still excluding any systematic bias above ~0.08
EPISODES, HORIZON, GAMMA, TEMPERATURE = 10, 4, 0.8, 1.0
K_ACTION, ALPHA_ACTION, K_STATE, ALPHA_STATE = 3.0, 0.3, 1.0, 0.3
SEEDS = 240


def reference_dpw_actions(env_handle):
    sys.path.insert(0, "/root/reference")
    if "numba" not in sys.modules:
        import types

        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.tree_search.mcts import MCTSAgent
    from rl_agents.agents.tree_search.mcts_dpw import MCTSDPW

    class _GeneratorShim:
        """Old RandomState spelling over the Generator the reference seeds."""

        def __init__(self, gen):
            self._gen = gen

        def randint(self, n):
            return self._gen.integers(n)

        def __getattr__(self, name):
            return getattr(self._gen, name)

    class RunnableDPW(MCTSDPW):
        """The reference unpacks 4-tuples from planner.step (pre-truncation
        gym API); adapt the 5-tuple."""

        def step(self, state, action):
            obs, reward, terminated, truncated, _ = super().step(state, action)
            return obs, reward, terminated, truncated

        def evaluate(self, state, observation, total_reward=0, depth=0):
            # mcts.py:160-177 rollout, over the 4-tuple step above
            for h in range(depth, self.config["horizon"]):
                actions, probabilities = self.rollout_policy(state, observation)
                action = self.np_random.choice(actions, 1,
                                               p=np.array(probabilities))[0]
                observation, reward, terminal, truncated = self.step(state, action)
                total_reward += self.config["gamma"] ** h * reward
                if np.all(terminal) or np.all(truncated):
                    break
            return total_reward

    counts = np.zeros(3, int)
    for seed in range(SEEDS):
        planner = RunnableDPW(env_handle, MCTSAgent.random_policy,
                          MCTSAgent.random_policy, {
                              "episodes": EPISODES, "horizon": HORIZON,
                              "budget": EPISODES * HORIZON, "gamma": GAMMA,
                              "temperature": TEMPERATURE, "closed_loop": True,
                              "k_action": K_ACTION, "alpha_action": ALPHA_ACTION,
                              "k_state": K_STATE, "alpha_state": ALPHA_STATE,
                              "step_strategy": "reset"})
        planner.seed(seed)
        planner.np_random = _GeneratorShim(planner.np_random)
        planner.step_by_reset()
        action = planner.plan(state=env_handle.fork(), observation=None)
        counts[int(np.atleast_1d(action)[0])] += 1
    return counts


def test_mcts_dpw_action_distribution_equivalence():
    env = make_mdp(dict(STOCH_CONFIG, max_episode_steps=1000))
    env.reset(seed=0)
    ref_counts = reference_dpw_actions(env.fork())

    probs = jax.numpy.ones(3) / 3
    keys = jax.random.split(jax.random.PRNGKey(0), SEEDS)
    actions, _ = jax.vmap(
        lambda k: mcts_dpw_plan(env.functional, env.params, env.state, k, probs,
                                num_actions=3, episodes=EPISODES,
                                horizon=HORIZON, gamma=GAMMA,
                                temperature=TEMPERATURE, k_action=K_ACTION,
                                alpha_action=ALPHA_ACTION, k_state=K_STATE,
                                alpha_state=ALPHA_STATE, width=8,
                                closed_loop=True))(keys)
    our_counts = np.bincount(np.asarray(actions).ravel(), minlength=3)

    ref_p = ref_counts / ref_counts.sum()
    our_p = our_counts / our_counts.sum()
    tv = 0.5 * np.abs(ref_p - our_p).sum()
    # the regime must actually discriminate: a single dominant action would
    # make any planner agree trivially
    assert (ref_counts > 0).sum() >= 2 and (our_counts > 0).sum() >= 2
    assert ref_counts.argmax() == our_counts.argmax()
    assert tv <= 0.15, (ref_counts.tolist(), our_counts.tolist())
