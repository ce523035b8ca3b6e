"""BFTQ tests: vmapped Pareto frontier / mixture parity vs the reference's
scipy-qhull implementation, plus integration smoke."""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_agents_tpu.agents.budgeted_ftq.agent import BFTQAgent, sample_simplex
from rl_agents_tpu.agents.budgeted_ftq.bftq import parse_betas
from rl_agents_tpu.agents.budgeted_ftq.greedy_policy import (
    batch_mixtures,
    frontier_values,
    optimal_mixture,
    pareto_frontier,
)
from rl_agents_tpu.agents.budgeted_ftq.models import BudgetedMLP
from rl_agents_tpu.envs.cartpole import make as make_cartpole


def reference_frontier(values, betas):
    sys.path.insert(0, "/root/reference")
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba
    from rl_agents.agents.budgeted_ftq.greedy_policy import (
        optimal_mixture as ref_mixture,
        pareto_frontier as ref_frontier,
    )

    hull_options = {"decimals": None, "qhull_options": "", "remove_duplicates": False,
                    "library": "scipy"}
    top, _ = ref_frontier(values.copy(), betas, hull_options)
    return top, ref_mixture


@pytest.mark.parametrize("trial", range(10))
def test_frontier_parity_vs_reference(trial):
    rng = np.random.default_rng(trial)
    B, A = 10, 2
    values = rng.random((B, 2 * A)).astype(np.float32)
    betas = np.arange(0, 1, 0.1)

    top_ref, ref_mixture = reference_frontier(values, betas)
    ref_qc = np.array([p.qc for p in top_ref])
    ref_qr = np.array([p.qr for p in top_ref])

    qr, qc, actions, budgets = frontier_values(jnp.asarray(values), jnp.asarray(betas))
    f = pareto_frontier(qr, qc, actions, budgets)
    n = int(f.count)
    our_qc = np.asarray(f.qc[:n])
    our_qr = np.asarray(f.qr[:n])

    # same frontier point sets (reference may keep collinear interior points;
    # ours is the strict hull — every one of our points must be in the
    # reference's, and the endpoints must match)
    assert set(np.round(our_qc, 5)) <= set(np.round(ref_qc, 5))
    np.testing.assert_allclose(our_qc[0], ref_qc[0], atol=1e-5)
    np.testing.assert_allclose(our_qc[-1], ref_qc[-1], atol=1e-5)
    np.testing.assert_allclose(our_qr[-1], ref_qr[-1], atol=1e-5)

    # mixture parity at random budgets: identical expected (Vr, Vc)
    for beta in rng.random(5):
        ref_mix = ref_mixture(top_ref, beta)
        ref_vr = (1 - ref_mix.probability_sup) * ref_mix.inf.qr \
            + ref_mix.probability_sup * ref_mix.sup.qr
        ref_vc = (1 - ref_mix.probability_sup) * ref_mix.inf.qc \
            + ref_mix.probability_sup * ref_mix.sup.qc
        mix = jax.tree.map(float, optimal_mixture(f, jnp.float32(beta)))
        our_vr = (1 - mix.probability_sup) * mix.qr_inf + mix.probability_sup * mix.qr_sup
        our_vc = (1 - mix.probability_sup) * mix.qc_inf + mix.probability_sup * mix.qc_sup
        np.testing.assert_allclose(our_vr, ref_vr, atol=1e-4)
        np.testing.assert_allclose(our_vc, ref_vc, atol=1e-4)


def test_batch_mixtures_shapes():
    rng = np.random.default_rng(0)
    S, B, A = 7, 10, 3
    q = jnp.asarray(rng.random((S, B, 2 * A)), jnp.float32)
    betas_disc = jnp.arange(0, 1, 0.1)
    betas = jnp.asarray(rng.random(S), jnp.float32)
    mix = batch_mixtures(q, betas_disc, betas)
    assert mix.probability_sup.shape == (S,)
    assert np.all((np.asarray(mix.probability_sup) >= 0)
                  & (np.asarray(mix.probability_sup) <= 1))


def test_parse_betas():
    np.testing.assert_allclose(parse_betas("np.arange(0, 1, 0.1)"), np.arange(0, 1, 0.1))
    np.testing.assert_allclose(parse_betas("np.linspace(0, 1, 5)"), np.linspace(0, 1, 5))
    np.testing.assert_allclose(parse_betas([0.1, 0.5]), [0.1, 0.5])
    with pytest.raises(ValueError):
        parse_betas("__import__('os')")


def test_sample_simplex():
    rng = np.random.default_rng(0)
    for _ in range(10):
        coeff = rng.random(4) + 0.1
        coeff /= coeff.sum()
        bias = rng.random()
        x = sample_simplex(coeff, bias, 0, 1, rng)
        np.testing.assert_allclose(coeff @ x, bias, atol=1e-9)


def test_budgeted_mlp():
    model = BudgetedMLP(size_state=4, n_actions=2, layers=(16,))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 5)))
    out = model.apply(params, jnp.ones((3, 5)))
    assert out.shape == (3, 4)  # 2 actions x (Qr, Qc)


class CostfulCartPole:
    """CartPole emitting info['cost'] = action (action 1 is costly)."""

    def __init__(self):
        self.env = make_cartpole({"max_episode_steps": 20})

    def __getattr__(self, name):
        return getattr(self.env, name)

    def step(self, action):
        obs, r, done, trunc, info = self.env.step(action)
        info["cost"] = float(action)
        return obs, r, done, trunc, info


def test_bftq_agent_integration():
    env = CostfulCartPole()
    agent = BFTQAgent(env, {
        "epochs": 2, "regression_epochs": 30,
        "betas_for_duplication": [0.0, 0.5, 1.0],
        "betas_for_discretisation": "np.arange(0, 1, 0.2)",
        "network": {"beta_encoder_type": "LINEAR", "size_beta_encoder": 5,
                    "activation_type": "RELU", "layers": [16]},
    })
    agent.seed(0)
    state, _ = env.reset(seed=0)
    for _ in range(30):
        action = agent.act(state)
        assert action in (0, 1)
        next_state, reward, done, truncated, info = env.step(action)
        agent.record(state, action, reward, next_state, done, info)
        state = next_state
        if done or truncated:
            state, _ = env.reset()
    assert len(agent.memory) == 30 * 3  # beta duplication x3
    agent.update()
    agent.eval()
    action = agent.act(state)
    assert action in (0, 1)


def test_bftq_on_intersection():
    """BASELINE config 5: budgeted fitted-Q on the intersection env, with
    costs emitted by the env itself (crashes)."""
    from rl_agents_tpu.envs.highway import make_intersection

    env = make_intersection({"vehicles_count": 4, "max_episode_steps": 12})
    agent = BFTQAgent(env, {
        "epochs": 2, "regression_epochs": 20,
        "betas_for_duplication": [0.0, 1.0],
        "betas_for_discretisation": "np.arange(0, 1, 0.25)",
        "network": {"beta_encoder_type": "LINEAR", "size_beta_encoder": 4,
                    "activation_type": "RELU", "layers": [16]},
    })
    agent.seed(0)
    state, _ = env.reset(seed=0)
    for _ in range(24):
        action = agent.act(state)
        next_state, reward, done, truncated, info = env.step(action)
        assert "cost" in info
        agent.record(state, action, reward, next_state, done, info)
        state = next_state
        if done or truncated:
            state, _ = env.reset()
    agent.update()
    agent.eval()
    assert agent.act(state) in range(3)


@pytest.mark.parametrize("trial", range(5))
def test_dense_hull_matches_monotone_chain(trial):
    """The dense O(P^3) hull membership must reproduce the stack-based
    monotone chain point-for-point on random clouds (the chain is the
    semantics oracle; the dense form is the TPU-fast path)."""
    from rl_agents_tpu.agents.budgeted_ftq.greedy_policy import (
        _pareto_frontier_chain,
    )

    rng = np.random.default_rng(100 + trial)
    P = 40
    qr = jnp.asarray(rng.random(P), jnp.float32)
    qc = jnp.asarray(rng.random(P), jnp.float32)
    actions = jnp.asarray(rng.integers(0, 4, P), jnp.int32)
    budgets = jnp.asarray(rng.random(P), jnp.float32)

    dense = pareto_frontier(qr, qc, actions, budgets)
    chain = _pareto_frontier_chain(qr, qc, actions, budgets)
    nd, nc = int(dense.count), int(chain.count)
    assert nd == nc, (nd, nc)
    np.testing.assert_allclose(np.asarray(dense.qc[:nd]), np.asarray(chain.qc[:nc]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dense.qr[:nd]), np.asarray(chain.qr[:nc]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(dense.action[:nd]),
                                  np.asarray(chain.action[:nc]))
