"""One-command interleaved A/B bisect for suspected perf regressions.

Round 5's "streaming regression" took a bespoke hand-run investigation
(docs/perf_notes_r06.md) to adjudicate as host noise; this tool is that
protocol as a command:

    python tools/bench_ab.py <ref> [--rounds 2]
                             [--section stream|chain|query --query NAME]

* checks out ``<ref>`` into a throwaway git worktree (HEAD stays
  untouched),
* runs the chosen bench section ALTERNATING HEAD → ref → HEAD → ref,
  each arm in a FRESH JVM subprocess (no cross-arm cache/codegen
  contamination), so slow host drift cancels instead of being
  attributed to whichever arm ran second,
* prints a per-run table and the median-per-arm verdict.

Sections:
* ``stream`` (default): ``bench.streaming_latency`` — 12 s discarded
  warmup + 35 s measured window; reports sustained rows/s, p50, p99.
* ``chain``: ``bench.pipeline_throughput`` at $SPARK_GRAFT_SF_DIR —
  reports operator-chain ops/s.
* ``query`` (with ``--query NAME``): one registry query at
  $SPARK_GRAFT_SF_DIR, warmed once, best of two timed runs — for
  bisecting a single BENCH_QUERIES.json regression.

Interpretation rule (from perf_notes_r06): a real code regression
shows BOTH HEAD runs worse than BOTH ref runs; anything overlapping is
host noise — re-run with --rounds 3 before concluding.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_STREAM_SNIPPET = """
import json, sys
sys.path.insert(0, {root!r})
from sequin_spark.session import get_spark
import bench
spark = get_spark("bench_ab")
spark.sparkContext.setLogLevel("ERROR")
bench.streaming_latency(spark, seconds=12, rows_per_second=5_000,
                        prefix="warmup")
r = bench.streaming_latency(spark, prefix="ab")
print("AB_RESULT " + json.dumps(r))
"""

_QUERY_SNIPPET = """
import json, os, sys, time
sys.path.insert(0, {root!r})
from sequin_spark.session import get_spark
spark = get_spark("bench_ab")
spark.sparkContext.setLogLevel("ERROR")
from sequin_spark.queries import QUERIES
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
fn = QUERIES[{qname!r}]
fn(spark, "/root/testdata/sf0.001").collect()  # warm codegen/caches
best = None
for _ in range(2):
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, sf_dir).collect()
    dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print("AB_RESULT " + json.dumps({{"query_sec": round(best, 3)}}))
"""

_CHAIN_SNIPPET = """
import json, os, sys
sys.path.insert(0, {root!r})
from sequin_spark.session import get_spark
import bench
spark = get_spark("bench_ab")
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
bench.pipeline_throughput(spark, "/root/testdata/sf0.001")  # warmup
sec, rows = bench.pipeline_throughput(spark, sf_dir)
print("AB_RESULT " + json.dumps(
    {{"chain_ops_per_sec": int(rows / sec) if sec > 0 else 0}}))
"""


def _run_arm(root: str, section: str, qname: str | None = None) -> dict:
    if section == "stream":
        snippet = _STREAM_SNIPPET.format(root=root)
    elif section == "chain":
        snippet = _CHAIN_SNIPPET.format(root=root)
    else:
        snippet = _QUERY_SNIPPET.format(root=root, qname=qname)
    out = subprocess.run(
        [sys.executable, "-c", snippet], cwd=root, capture_output=True,
        text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"arm produced no AB_RESULT (exit {out.returncode}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="git ref for the B arm (e.g. a round tag)")
    ap.add_argument("--rounds", type=int, default=2,
                    help="HEAD/ref pairs to run (default 2)")
    ap.add_argument("--section", choices=["stream", "chain", "query"],
                    default="stream")
    ap.add_argument("--query", help="registry query name (section=query)")
    args = ap.parse_args()
    if args.section == "query" and not args.query:
        ap.error("--section query requires --query NAME")

    wt = tempfile.mkdtemp(prefix="bench_ab_")
    subprocess.run(["git", "worktree", "add", "--detach", wt, args.ref],
                   cwd=HERE, check=True, capture_output=True)
    runs: list[tuple[str, dict]] = []
    try:
        for i in range(args.rounds):
            for arm, root in (("HEAD", HERE), (args.ref, wt)):
                print(f"[{i + 1}/{args.rounds}] running {arm} "
                      f"({args.section})...", flush=True)
                r = _run_arm(root, args.section, args.query)
                runs.append((arm, r))
                print(f"    {r}")
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       cwd=HERE, capture_output=True)

    key = {"stream": "stream_rows_per_sec",
           "chain": "chain_ops_per_sec",
           "query": "query_sec"}[args.section]
    print(f"\n{'arm':<12} " + " ".join(f"{k:>22}" for k in runs[0][1]))
    for arm, r in runs:
        print(f"{arm:<12} " + " ".join(f"{v:>22}" for v in r.values()))
    by_arm: dict[str, list[float]] = {}
    for arm, r in runs:
        by_arm.setdefault(arm, []).append(float(r.get(key, 0)))
    meds = {arm: statistics.median(v) for arm, v in by_arm.items()}
    fmt = "{:.3f}" if args.section == "query" else "{:,.0f}"
    print(f"\nmedian {key}: " +
          ", ".join(f"{a}={fmt.format(m)}" for a, m in meds.items()))
    # normalize to higher-is-better for the verdict (query_sec: invert)
    if args.section == "query":
        head = 1.0 / max(meds.get("HEAD", 0), 1e-9)
        ref = 1.0 / max(meds.get(args.ref, 0), 1e-9)
    else:
        head, ref = meds.get("HEAD", 0), meds.get(args.ref, 0)
    overlap = (max(by_arm["HEAD"]) >= min(by_arm[args.ref])
               and max(by_arm[args.ref]) >= min(by_arm["HEAD"]))
    if overlap:
        print("VERDICT: arms OVERLAP — host noise until proven "
              "otherwise (re-run with --rounds 3).")
    elif head < ref:
        print(f"VERDICT: HEAD consistently slower "
              f"({head / ref:.0%} of {args.ref}) — likely a real "
              f"regression; bisect further.")
    else:
        print(f"VERDICT: HEAD consistently faster "
              f"({head / ref:.0%} of {args.ref}).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
