"""CLI unit tests: config sweep expansion and evaluate plumbing."""
import json
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "scripts"))

from experiments import generate_agent_configs


def test_generate_agent_configs_sweep(tmp_path):
    base = tmp_path / "base.json"
    base.write_text(json.dumps({"__class__": "MCTSAgent", "budget": 100,
                                "exploration": {"tau": 1}}))
    benchmark = {"agents": [
        {"base_agent": str(base),
         "sweep": {"budget": [50, 100], "exploration/tau": [1, 2]}},
        str(base),
    ]}
    agents = generate_agent_configs(benchmark)
    assert len(agents) == 5  # 2x2 sweep + the plain path
    budgets = sorted(a["budget"] for a in agents if isinstance(a, dict))
    assert budgets == [50, 50, 100, 100]
    taus = sorted(a["exploration"]["tau"] for a in agents if isinstance(a, dict))
    assert taus == [1, 1, 2, 2]


def test_config_corpus_integrity():
    """Every JSON in scripts/configs parses; every agent config's __class__
    resolves in the factory registry; every functional env id loads. Bridge
    env families (highway_env / sailing_env ids) are format-checked only —
    those packages are optional (reference: scripts/configs/** 16 families)."""
    import json
    from pathlib import Path

    from rl_agents_tpu.factory import AGENT_REGISTRY, ENV_REGISTRY, load_environment

    root = Path(__file__).resolve().parents[1] / "scripts" / "configs"
    families = [d for d in root.iterdir() if d.is_dir()]
    assert len(families) >= 16  # the reference ships 16 env families

    n_agents = n_envs = 0
    for path in root.rglob("*.json"):
        with open(path) as f:
            cfg = json.load(f)
        if "benchmark_summary" in path.name or path.parent == root:
            continue
        if "__class__" in cfg:
            name = cfg["__class__"].split("'")[1].split(".")[-1] \
                if cfg["__class__"].startswith("<class") else cfg["__class__"]
            assert name in AGENT_REGISTRY, f"{path}: unknown agent {name}"
            n_agents += 1
        elif "id" in cfg:
            n_envs += 1
            if cfg["id"] in ENV_REGISTRY:
                env = load_environment(cfg)
                env.reset(seed=0)
        # else: benchmark / sweep / logging configs — parse-only
    assert n_agents >= 30 and n_envs >= 16
