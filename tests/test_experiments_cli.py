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

    # Configs the REFERENCE itself ships dangling: ModelBiasAgent does not
    # exist in its robust_epc.py (only RobustEPCAgent/NominalEPCAgent). Kept
    # for corpus completeness, excluded from factory resolution. The dead
    # BaiMCTSAgent/ family (no bai_mcts.py in the reference) is not ported.
    dead_in_reference = {"ObstacleEnv/agents/model_bias.json"}

    n_agents = n_envs = 0
    for path in root.rglob("*.json"):
        with open(path) as f:
            cfg = json.load(f)
        if "benchmark_summary" in path.name or path.parent == root:
            continue
        if str(path.relative_to(root)) in dead_in_reference:
            continue
        if "base_config" in cfg and "id" not in cfg:
            # sweep/variant configs: the full inheritance chain must merge
            # and yield a factory-resolvable class (reference factory.py:44-56)
            from rl_agents_tpu.configuration import load_json_config
            cfg = load_json_config(path)
            assert "__class__" in cfg, f"{path}: chain has no __class__"
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
    # full reference corpus ported (235 ref files - 4 dead + repo extras)
    assert n_agents >= 150 and n_envs >= 50


def test_robust_merge_study(tmp_path, monkeypatch):
    """The reference's MergeEnv robust-control benchmark runs end-to-end on
    the functional surrogates: corpus env/agent configs (incl. the
    change_vehicles behavior-ensemble preprocessors) -> per-pair returns CSV
    (reference: scripts/configs/MergeEnv/benchmark_robust_control.json)."""
    import planners_robust_evaluation as study

    monkeypatch.setattr(
        sys, "argv",
        ["planners_robust_evaluation.py", "--study", "merge", "--seeds", "1",
         "--budget", "15", "--horizon", "4", "--out", str(tmp_path)])
    study.main()
    lines = (tmp_path / "results.csv").read_text().splitlines()
    assert lines[0] == "agent,environment,mean_return,std_return"
    rows = [ln.split(",") for ln in lines[1:]]
    # 3 unique agents x 2 envs, finite returns
    assert len(rows) == 6
    agents = {r[0] for r in rows}
    assert agents == {"assume_aggressive", "assume_defensive", "agg_def"}
    assert all(float(r[2]) > 0 for r in rows)


def test_planner_study_regret_csv(tmp_path, monkeypatch):
    """The planner-efficiency study writes the reference's exact CSV schema
    and measures simple regret against the VI oracle
    (reference: scripts/planners_evaluation.py:147-156,178-190)."""
    import planners_evaluation as study

    monkeypatch.setattr(
        sys, "argv",
        ["planners_evaluation.py", "--budgets", "1", "--budget-max", "1",
         "--seeds", "2", "--agents", "random", "OPD",
         "--out", str(tmp_path)])
    study.main()

    csv_path = tmp_path / "data.csv"
    lines = csv_path.read_text().strip().splitlines()
    # column schema matches the reference result dict, in order
    assert lines[0].split(",") == ["agent", "budget", "seed", "total_reward",
                                   "return", "mean_return", "length",
                                   "simple_regret", "gap"]
    rows = [dict(zip(lines[0].split(","), ln.split(","))) for ln in lines[1:]]
    assert len(rows) == 4  # 2 agents x 1 budget x 2 seeds
    opd_regret = [float(r["simple_regret"]) for r in rows if r["agent"] == "OPD"]
    rnd_regret = [float(r["simple_regret"]) for r in rows if r["agent"] == "random"]
    # OPD with any budget on the loop MDP finds the oracle action exactly
    assert all(r == 0.0 for r in opd_regret)
    # the gap column is the oracle's own action gap, strictly positive here
    assert all(float(r["gap"]) > 0 for r in rows)
    assert max(rnd_regret) >= 0.0
