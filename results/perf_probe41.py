"""Round-6 probe #41: clean A/B of the STanHop matmul-lattice trims.

probe40's train cell (trims ON) read 30.65 ms vs probe39's 28.60 (round-6
pre-trim control) — a possible REGRESSION hiding in a cross-probe
comparison. This isolates each flag in one harness:

  base   _FUSE_SELF_QK=0 _REUSE_KV=0   (pre-trim code path)
  qk     fuse only
  kv     reuse only
  both   trims as committed

Usage: python results/perf_probe41.py {base|qk|kv|both}
"""

import sys

import outeffhop_tpu.models.stanhop as sh

cell = sys.argv[1]
sh._FUSE_SELF_QK = cell in ("qk", "both")
sh._REUSE_KV = cell in ("kv", "both")

src = open("results/perf_probe40.py").read()
sys.argv = ["probe40", "train"]
ns = {"__name__": "__main__"}
exec(compile(src.replace('cell = sys.argv[1]', f'cell = "train_{cell}"')
             .replace('cell.startswith("fwd")', 'False')
             .replace('dropout_on = cell in ("fwd_drop", "train")',
                      'dropout_on = True'),
             "perf_probe40.py", "exec"), ns)
