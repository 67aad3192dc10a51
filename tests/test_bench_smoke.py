"""The headline bench script must always produce its JSON lines — the
driver runs it on real hardware every round, so a CPU smoke here protects it
from import/shape regressions (it was previously untested).

Since driver round 5 bench prints TWO lines: first the kernel-engaging guard
(BERT clippedsoftmax1 T512, vs_baseline pinned to the round-4 chip
measurement so a Pallas regression moves a headline number), LAST the
headline line the round driver parses.

In-process (not subprocess) on purpose: conftest pins this process to the CPU
platform; a subprocess would pick up whatever platform the environment's
sitecustomize selects, which can be a real accelerator.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_json_lines(capsys):
    sys.path.insert(0, REPO)
    try:
        import bench
        bench.main()
    finally:
        sys.path.remove(REPO)
    out = capsys.readouterr().out
    lines = [l for l in out.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 2, out
    guard = json.loads(lines[0])
    assert guard["metric"] == "bert_base_clippedsoftmax1_T512_flash_guard"
    assert guard["value"] > 0 and guard["vs_baseline"] > 0
    assert guard["vs_xla"] > 0  # same-run flash/XLA ratio (drift-immune)
    # the LAST line is what the round driver records — headline metric
    rec = json.loads(lines[-1])
    assert rec["metric"] == "bert_base_softmax1_mlm_inference_bf16"
    assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
