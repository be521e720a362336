"""Core-count scaling curve for the streaming pipeline — the local
analog of the reference's published instance-size table
(docs/performance.mdx:36-41: c8g.xlarge 4 vCPU → 20k ops/s, 2xlarge
8 vCPU → 34k, 4xlarge 16 vCPU → 58k).

Runs the capacity probe (synthetic source → full operator chain → noop
sink) in a FRESH JVM per core count (`local[N]` is fixed at session
build, so each point needs its own process), reporting sustained rows/s
per N.  A flat curve means the pipeline serializes somewhere and would
NOT scale with executors at 100 TB; the published reference curve is
the comparison bar.

Usage: python tools/bench_scaling.py [cores ...]   (default 4 8 16 32)
Writes a markdown row set to stdout; paste into docs/SCALE.md when the
curve changes materially.
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
spark = get_spark("bench_scaling")
spark.sparkContext.setLogLevel("ERROR")
bench.streaming_latency(spark, seconds=10, rows_per_second=5_000,
                        prefix="warmup")
r = bench.streaming_latency(spark, seconds=20, rows_per_second=150_000,
                            prefix="scale")
print("SCALE_RESULT " + json.dumps(r))
"""


def run_point(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    out = subprocess.run(
        [sys.executable, "-c", _SNIPPET.format(root=HERE)], cwd=HERE,
        env=env, capture_output=True, text=True, timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("SCALE_RESULT "):
            return json.loads(line[len("SCALE_RESULT "):])
    raise RuntimeError(f"cores={cores}: no result (exit {out.returncode})\n"
                       f"{out.stderr[-1500:]}")


def main() -> int:
    cores = [int(c) for c in sys.argv[1:]] or [4, 8, 16, 32]
    print("| cores | sustained rows/s | p50 ms | reference @ similar vCPU |")
    print("|---|---|---|---|")
    ref = {4: "20,000 (c8g.xlarge)", 8: "34,000 (c8g.2xlarge)",
           16: "58,000 (c8g.4xlarge)"}
    for n in cores:
        r = run_point(n)
        print(f"| {n} | {r.get('stream_rows_per_sec', 0):,} "
              f"| {r.get('stream_p50_ms', -1)} "
              f"| {ref.get(n, '—')} |", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
