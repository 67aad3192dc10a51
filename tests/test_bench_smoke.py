"""The headline bench script must always produce its one JSON line — the
driver runs it on real hardware every round, so a CPU smoke here protects it
from import/shape regressions (it was previously untested).

In-process (not subprocess) on purpose: conftest pins this process to the CPU
platform; a subprocess would pick up whatever platform the environment's
sitecustomize selects, which can be a real accelerator.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line(capsys):
    sys.path.insert(0, REPO)
    try:
        import bench
        bench.main()
    finally:
        sys.path.remove(REPO)
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
