"""Low-latency trigger sweep (VERDICT r7 task #3).

The reference publishes 55 ms avg / 253 ms p99 end-to-end latency
(docs/performance.mdx); this engine's default 1 s micro-batch trigger
gives p50 ~850 ms.  This tool measures where micro-batch latency
bottoms out: the same 100 B / 50k rows/s workload the row-size sweep
uses, at descending trigger intervals, each in a fresh JVM so codegen
warm-up and state-store residue never leak between points.

    python tools/bench_lowlat.py            # 1000 / 500 / 250 / 100 ms
    python tools/bench_lowlat.py 250 50     # custom ms points

Continuous-processing mode is NOT a point on this curve by
construction: the pipeline's sink path is a foreachBatch (delivery
ledger + ack discipline require batch boundaries), and Spark's
continuous mode supports neither foreachBatch nor
flatMapGroupsWithState-style stateful operators — the micro-batch
floor measured here IS the engine's latency floor.  Results go to
stdout as one JSON line per point; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = """
import json, sys
sys.path.insert(0, {root!r})
from sequin_spark.session import get_spark
import bench
spark = get_spark("bench_lowlat")
spark.sparkContext.setLogLevel("ERROR")
bench.streaming_latency(spark, seconds=10, rows_per_second=5_000,
                        prefix="warmup", trigger_seconds={trig})
r = bench.streaming_latency(spark, seconds=35, rows_per_second=50_000,
                            row_bytes=100, prefix="lowlat",
                            trigger_seconds={trig})
print("LOWLAT_RESULT " + json.dumps(r))
"""


def run_point(trigger_ms: int) -> dict:
    snippet = _SNIPPET.format(root=HERE, trig=trigger_ms / 1000.0)
    out = subprocess.run([sys.executable, "-c", snippet], cwd=HERE,
                         capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("LOWLAT_RESULT "):
            r = json.loads(line[len("LOWLAT_RESULT "):])
            r["trigger_ms"] = trigger_ms
            return r
    raise RuntimeError(f"no result (exit {out.returncode}):\n"
                       f"{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main() -> int:
    points = [int(a) for a in sys.argv[1:]] or [1000, 500, 250, 100]
    results = []
    for ms in points:
        print(f"measuring trigger={ms}ms ...", flush=True)
        r = run_point(ms)
        results.append(r)
        print(json.dumps(r))
    print("\nLOWLAT_SWEEP " + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
