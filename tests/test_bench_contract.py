"""The driver contract for bench.py: it prints exactly ONE JSON line with the
headline metric, an honest device label, and the baseline method. Run at tiny
sizes on the forced-CPU path (the same code path the dead-tunnel fallback
takes) so the contract is covered by the suite.
"""
import importlib
import json
import sys


def test_bench_emits_one_json_line(monkeypatch, capsys):
    monkeypatch.setenv("BENCH_FORCE_CPU", "1")
    sys.modules.pop("bench", None)
    bench = importlib.import_module("bench")
    monkeypatch.setattr(bench, "B", 8)
    monkeypatch.setattr(bench, "REPS", 2)

    def tiny_dqn():
        return bench.bench_dqn_fused(num_envs=8, steps=50)

    monkeypatch.setattr(bench, "bench_dqn_fused", tiny_dqn)
    ref = bench.bench_reference_mcts_cartpole
    monkeypatch.setattr(bench, "bench_reference_mcts_cartpole",
                        lambda: ref(trials=1))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, out
    record = json.loads(out[0])
    assert record["metric"] == "mcts_cartpole_env_steps_per_sec_8trees"
    assert record["device"] == "cpu"
    assert record["trees"] == 8
    assert record["value"] > 0
    assert record["baseline_value"] and record["vs_baseline"] > 0
    assert "baseline_method" in record and "timing_method" in record
    extra = record["extra"]
    for key in ("mcts_highway_steps_per_sec", "opd_highway_expansions_per_sec",
                "dqn_fused_env_steps_per_sec"):
        assert extra[key] is None or extra[key] > 0


def _ref_one_trial(bench):
    return bench.bench_reference_mcts_cartpole(trials=1)
