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
