"""Every registry entry must resolve and instantiate on a suitable env
(guards the registry-vs-direct-import seam)."""
import pytest

from rl_agents_tpu.factory import AGENT_REGISTRY, _resolve, agent_class, load_agent
from rl_agents_tpu.envs.cartpole import make as make_cartpole
from rl_agents_tpu.envs.finite_mdp import make as make_mdp
from rl_agents_tpu.envs.linear import make as make_linear

LOOP = {"mode": "deterministic",
        "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
        "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
        "terminal": [0, 0, 0, 0]}

# minimal env + config per agent needing special setup
SPECIAL = {
    "ValueIterationAgent": (lambda: make_mdp(LOOP), {"gamma": 0.9}),
    "RobustValueIterationAgent": (lambda: make_mdp(LOOP),
                                  {"gamma": 0.9, "models": [dict(LOOP)]}),
    "BFTQAgent": (lambda: make_cartpole({}), {
        "epochs": 1, "betas_for_duplication": [0.5],
        "betas_for_discretisation": [0.0, 0.5],
        "network": {"beta_encoder_type": "LINEAR", "size_beta_encoder": 2,
                    "activation_type": "RELU", "layers": [4]}}),
    "RobustEPCAgent": (lambda: make_linear({}), {
        "A": [[0.0, 1.0], [0.0, 0.0]], "B": [[0.0], [1.0]], "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]], "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 6}}),
    "NominalEPCAgent": (lambda: make_linear({}), {
        "A": [[0.0, 1.0], [0.0, 0.0]], "B": [[0.0], [1.0]], "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]], "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 6}}),
    "ConstrainedEPCAgent": (lambda: make_linear({}), {
        "A": [[0.0, 1.0], [0.0, 0.0]], "B": [[0.0], [1.0]], "D": [[0.0], [1.0]],
        "phi": [[[0.0, 0.0], [0.0, -1.0]]], "sigma": [[1.0, 0.0], [0.0, 1.0]],
        "parameter_box": [[0.0], [1.0]],
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 6}}),
    "IntervalRobustPlannerAgent": (lambda: make_mdp(LOOP), {
        "sub_agent": {"__class__": "DeterministicPlannerAgent", "budget": 6}}),
    "LinearFeedbackAgent": (lambda: make_linear({}), {"K": [[1.0, 0.5]]}),
    "IntervalFeedbackAgent": (lambda: make_linear({}), {
        "A0": [[0.0, 1.0], [0.0, 0.0]], "dA": [[[0.0, 0.0], [0.0, 0.1]]],
        "B": [[0.0], [1.0]], "D": [[0.0], [1.0]]}),
    "OpenLoopAgent": (lambda: make_cartpole({}), {"actions": [0, 1]}),
    "DQNAgent": (lambda: make_cartpole({}),
                 {"model": {"type": "MultiLayerPerceptron", "layers": [4]}}),
    "FTQAgent": (lambda: make_cartpole({}),
                 {"model": {"type": "MultiLayerPerceptron", "layers": [4]}}),
    "MCTSWithPriorPolicyAgent": (lambda: make_cartpole({}), {
        "budget": 10, "prior_agent": {
            "__class__": "DQNAgent",
            "model": {"type": "MultiLayerPerceptron", "layers": [4]},
            "exploration": {"method": "Boltzmann"}}}),
}


@pytest.mark.parametrize("name", sorted(AGENT_REGISTRY))
def test_registry_entry_resolves(name):
    cls = agent_class(name)
    assert cls.__name__ == name


@pytest.mark.parametrize("name", sorted(AGENT_REGISTRY))
def test_registry_entry_instantiates(name):
    make_env, config = SPECIAL.get(name, (lambda: make_cartpole({}), {"budget": 10}))
    env = make_env()
    env.reset(seed=0)
    agent = load_agent({"__class__": name, **config}, env)
    assert agent is not None
