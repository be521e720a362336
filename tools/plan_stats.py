"""Machine-readable plan-shape baseline (r9 verdict task #8).

`docs/PLAN_AUDIT.md` is regenerated each round but nothing DIFFS it: a
query whose shuffle count doubles would still pass the NLJ/pushdown
gate.  This tool writes `tests/data/plan_stats_baseline.json` with
per-query physical-plan statistics (shuffles, broadcast-hash joins,
sort-merge joins, nested-loop joins); the pytest gate
(`tests/test_plan_quality.py::test_plan_shape_gate`) fails any query
whose counts GROW past the committed baseline — growth needs either a
fix or a justified baseline update in the same commit.

Counts are taken per query as the MAX over a cold and a warm
construction in one session: queries with persisted index warm paths
(ann_*, semdedup, ...) legitimately plan fewer nodes once their index
is cached, and the gate must not flake on suite ordering.

Usage: python tools/plan_stats.py --write [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASELINE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "plan_stats_baseline.json")

STATS = ("shuffles", "bhj", "smj", "nlj")


def plan_stats(formatted_plan: str) -> dict:
    """Node counts from .explain('formatted') output (each operator
    appears once in the numbered tree — match the '(N) Op' details)."""
    return {
        "shuffles": len(re.findall(r"\(\d+\) Exchange\b", formatted_plan)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin",
                              formatted_plan)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", formatted_plan)),
        "nlj": len(re.findall(
            r"\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)",
            formatted_plan)),
    }


def stats_for(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return plan_stats(buf.getvalue())


def collect_baseline(spark, sf_dir: str) -> dict:
    from sequin_spark.plan_capture import capture_plans
    from sequin_spark.queries import QUERIES

    out: dict[str, dict] = {}
    for pass_no in range(2):  # cold, then warm (index caches populated)
        for name in sorted(QUERIES):
            # see-through plan checkpoints (r14, verdict task #4): the
            # baseline records the FULL compute graph behind the
            # evaluate-once localCheckpoint sites, closing the
            # LogicalRDD-leaf blind spot the r13 verdict flagged
            with capture_plans():
                df = QUERIES[name](spark, sf_dir)
            s = stats_for(df)
            if name in out:
                out[name] = {k: max(out[name][k], s[k]) for k in STATS}
            else:
                out[name] = s
            if pass_no == 0:
                print(f"{name}: {s}", flush=True)
    return out


def main() -> None:
    write = "--write" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    from sequin_spark.session import get_spark

    spark = get_spark("plan_stats", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    baseline = collect_baseline(spark, sf_dir)
    if write:
        os.makedirs(os.path.dirname(BASELINE_PATH), exist_ok=True)
        with open(BASELINE_PATH, "w") as f:
            json.dump(baseline, f, indent=1, sort_keys=True)
        print(f"wrote {BASELINE_PATH} ({len(baseline)} queries)")
    else:
        with open(BASELINE_PATH) as f:
            committed = json.load(f)
        grew = {
            n: (committed.get(n), s) for n, s in baseline.items()
            if n not in committed
            or any(s[k] > committed[n][k] for k in STATS)}
        print(json.dumps(grew, indent=1) if grew else "no growth")


if __name__ == "__main__":
    main()
