"""Per-query execution profile for the optimization rounds (guide §1).

Runs each registry query through the noop sink inside its own job group
and records wall seconds plus scheduler shape — number of jobs, stages,
tasks — from the status tracker.  The job/stage counts expose what the
wall number alone can't: whether a slow query is slow because of ONE
big serial stage (parallelism bug), many tiny jobs (driver round-trip
bound — iterative kernels, bounded collects), or genuine distributed
compute.

Usage: python tools/profile_queries.py [sf_dir] [query ...]
Writes JSON lines to stdout and a summary to docs/profile_<sf>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:]

    from sequin_spark.queries import QUERIES
    from sequin_spark.session import get_spark

    spark = get_spark("profile_queries")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup (codegen/JIT) on the smallest sf
    try:
        QUERIES["pipeline_flagship"](spark, "/root/testdata/sf0.001") \
            .write.format("noop").mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass

    todo = names or list(QUERIES)
    out = {}
    for name in todo:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.time() - t1
            err = None
        except Exception as e:  # noqa: BLE001
            t_build = t_exec = -1.0
            err = str(e)[:200]
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        max_stage_tasks = 0
        for jid in jobs:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                n_stages += 1
                n_tasks += si.numTasks
                max_stage_tasks = max(max_stage_tasks, si.numTasks)
        rec = {
            "build_s": round(t_build, 3), "exec_s": round(t_exec, 3),
            "jobs": len(jobs), "stages": n_stages, "tasks": n_tasks,
            "max_stage_tasks": max_stage_tasks,
        }
        if err:
            rec["error"] = err
        out[name] = rec
        print(json.dumps({"q": name, **rec}), flush=True)
        spark.catalog.clearCache()

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", f"profile_{sf_tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
