"""Robust planning & control tests."""
import jax
import jax.numpy as jnp
import numpy as np

from rl_agents_tpu.agents.control import IntervalFeedbackAgent, LinearFeedbackAgent
from rl_agents_tpu.agents.robust.constrained_epc import ConstrainedEPCAgent
from rl_agents_tpu.agents.robust.robust import DiscreteRobustPlannerAgent, robust_opd_plan
from rl_agents_tpu.agents.robust.robust_epc import NominalEPCAgent, RobustEPCAgent
from rl_agents_tpu.agents.tree_search.deterministic import opd_plan
from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.envs.linear import make as make_linear
from rl_agents_tpu.robust.interval import lpv_step, lpv_trajectory, make_lpv

LOOP = {
    "mode": "deterministic",
    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
    "terminal": [0, 0, 0, 0],
}


def test_interval_predictor_contains_trajectory():
    """The interval must contain the true trajectory for every theta in the box."""
    a0 = np.array([[0.0, 1.0], [0.0, -0.5]])
    da = np.array([[[0.0, 0.0], [0.0, -0.5]]])  # theta in [0,1] scales extra damping
    x0 = np.array([1.0, 0.0])
    lpv = make_lpv(a0, da, x0)
    controls = jnp.zeros((20, 1))
    lo, hi = lpv_trajectory(lpv, controls, 0.05)
    for theta in [0.0, 0.3, 1.0]:
        a = a0 + theta * da[0]
        x = x0.copy()
        for t in range(20):
            x = x + 0.05 * (a @ x)
            assert np.all(np.asarray(lo[t]) <= x + 1e-5), f"t={t} theta={theta}"
            assert np.all(x <= np.asarray(hi[t]) + 1e-5), f"t={t} theta={theta}"


def test_robust_opd_lower_bounds_nominal():
    """Robust OPD over an ensemble must be at most the single-model OPD value."""
    env = make_mdp(dict(LOOP, max_episode_steps=1000))
    env.reset(seed=0)
    # ensemble: nominal params + degraded-reward variant
    p1 = env.params
    p2 = p1._replace(reward=p1.reward * 0.5)
    ensemble = jax.tree.map(lambda a, b: jnp.stack([a, b]), p1, p2)
    states0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + jnp.shape(x)), env.state)

    actions_r, len_r, tree_r = robust_opd_plan(
        env.functional, ensemble, states0, jax.random.PRNGKey(0),
        num_actions=3, num_models=2, expansions=20, gamma=0.8)
    actions_n, len_n, tree_n = opd_plan(
        env.functional, p1, env.state, jax.random.PRNGKey(0),
        num_actions=3, expansions=20, gamma=0.8)
    assert float(jnp.min(tree_r.value_lower[0])) <= float(tree_n.value_lower[0]) + 1e-5
    assert int(len_r) >= 1


def test_discrete_robust_planner_agent():
    env = make_mdp(dict(LOOP, max_episode_steps=50))
    env.reset(seed=0)
    agent = DiscreteRobustPlannerAgent(env, {"budget": 30, "gamma": 0.8, "models": []})
    agent.seed(0)
    assert agent.act(0) in range(3)


def test_linear_feedback():
    agent = LinearFeedbackAgent(None, {"K": [[1.0, 0.5]], "discrete": True})
    # state above reference -> control negative -> action 1
    assert agent.act(np.array([1.0, 0.0])) == 1
    assert agent.act(np.array([-1.0, 0.0])) == 0


def test_interval_feedback_synthesis_and_act():
    agent = IntervalFeedbackAgent(None, {
        "A0": [[0.0, 1.0], [0.0, 0.0]],
        "dA": [[[0.0, 0.0], [0.0, 0.1]]],
        "B": [[0.0], [1.0]],
        "D": [[0.0], [1.0]],
        "perturbation_bound": 0.0,
    })
    agent.reset()  # synthesizes S and K0 via pole placement fallback
    assert agent.K0 is not None and agent.S is not None
    obs = {"interval_min": np.array([0.5, 0.0]), "interval_max": np.array([0.6, 0.1]),
           "reference_state": np.zeros(2), "state": np.array([0.55, 0.05])}
    u = agent.act(obs)
    assert np.isfinite(u).all()
    # positive position error -> negative (restoring) control
    assert u[0] < 0


def test_robust_epc_agent_runs():
    env = make_linear({"max_episode_steps": 30})
    agent = RobustEPCAgent(env, {
        "A": [[0.0, 1.0], [0.0, 0.0]],
        "B": [[0.0], [1.0]],
        "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]],
        "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "omega": [[0.0], [0.0]],
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 20, "gamma": 0.9},
    })
    agent.seed(0)
    obs, _ = env.reset(seed=0)
    for _ in range(5):
        action = agent.act(obs)
        assert action in (0, 1)
        next_obs, reward, done, truncated, info = env.step(action)
        agent.record(obs, action, reward, next_obs, done, info)
        obs = next_obs
    # data recorded, ellipsoid shrinks towards the true theta=0.5
    assert len(agent.data) == 5
    theta, _, beta = agent.ellipsoids[-1]
    assert theta.shape == (1,)


def test_nominal_epc_no_uncertainty():
    env = make_linear({})
    agent = NominalEPCAgent(env, {
        "A": [[0.0, 1.0], [0.0, 0.0]],
        "B": [[0.0], [1.0]],
        "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]],
        "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "omega": [[0.0], [0.0]],
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 10, "gamma": 0.9},
    })
    a0, da = agent.polytope()
    assert np.allclose(da[0], 0)


def test_constrained_epc_agent_runs():
    env = make_linear({"max_episode_steps": 30})
    agent = ConstrainedEPCAgent(env, {
        "A": [[0.0, 1.0], [0.0, 0.0]],
        "B": [[0.0], [1.0]],
        "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]],
        "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "omega": [[0.0], [0.0]],
        "parameter_box": [[0.0], [1.0]],
        "noise_bound": 0.1,
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 10, "gamma": 0.9},
    })
    obs, _ = env.reset(seed=0)
    for _ in range(3):
        plan = agent.plan(obs)
        obs, reward, done, truncated, info = env.step(
            1 if np.ravel(plan[0])[0] < 0 else 0)
    assert agent.feedback.K0 is not None
