"""Fourth-decade disk-ceiling measurement (r12 verdict task #9).

The r12 plan (docs/SCALE.md "Fourth decade") argued sf1000 cannot run
in this sandbox; the verdict asked for the next-best thing: either run
the two-table ``wal_pipeline_log`` subset at the largest SF that fits,
or MEASURE the disk ceiling that makes even the subset infeasible.
This tool does the measurement: it executes ``wal_pipeline_log`` at
the given scale(s) with the Spark UI's REST metrics on, records the
actual shuffle-write + spill bytes per run, and computes the largest
scale factor whose (two-table input growth + shuffle footprint +
measured spill) fits the volume's free bytes — the committed number
the SCALE.md ceiling claim rests on.

Usage: python tools/measure_disk_ceiling.py [sf_dir ...]
       (default: .localdata/sf10 then .localdata/sf100 if disk allows)
Prints one JSON line per run plus the ceiling arithmetic.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

TWO_TABLE_BYTES = {  # orders.parquet + lineitem.parquet on disk
    "sf10": None, "sf100": None,  # filled from the actual files
}


def _two_table_bytes(sf_dir: str) -> int:
    return sum(os.path.getsize(os.path.join(sf_dir, f))
               for f in ("orders.parquet", "lineitem.parquet"))


def stage_metrics(spark) -> dict:
    """Sum shuffle write / spill bytes over all completed stages via
    the UI REST API (the only stable public surface for these)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete",
            timeout=30) as r:
        stages = json.loads(r.read())
    return {
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0)
                                   for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0)
                                  for s in stages),
        "disk_spill_bytes": sum(s.get("diskBytesSpilled", 0)
                                for s in stages),
        "memory_spill_bytes": sum(s.get("memoryBytesSpilled", 0)
                                  for s in stages),
        "n_stages": len(stages),
    }


def run_one(spark, sf_dir: str) -> dict:
    from sequin_spark.queries import QUERIES

    before = stage_metrics(spark)
    t0 = time.time()
    QUERIES["wal_pipeline_log"](spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    dt = time.time() - t0
    after = stage_metrics(spark)
    out = {k: after[k] - before[k] for k in after}
    out.update({
        "sf_dir": sf_dir,
        "seconds": round(dt, 1),
        "input_two_table_bytes": _two_table_bytes(sf_dir),
    })
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    dirs = sys.argv[1:] or [os.path.join(HERE, ".localdata", "sf10")]
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .appName("disk_ceiling").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    free = shutil.disk_usage(HERE).free
    runs = []
    for d in dirs:
        r = run_one(spark, d)
        runs.append(r)
        print(json.dumps(r, separators=(",", ":")), flush=True)

    # ceiling arithmetic from the LARGEST measured run: footprint(SF) =
    # input growth beyond what is already resident + shuffle write +
    # disk spill, all ~linear in SF (the plan is scale-invariant:
    # one sized exchange — docs/SCALE.md r12 table).  The shuffle
    # write lives on disk for the duration of the job, so it counts
    # against free bytes in full.
    big = runs[-1]
    sf_of = {os.path.basename(r["sf_dir"].rstrip("/")): r for r in runs}
    base_sf = float(os.path.basename(
        big["sf_dir"].rstrip("/")).replace("sf", ""))
    per_sf = {
        "input_bytes_per_sf": big["input_two_table_bytes"] / base_sf,
        "shuffle_write_per_sf": big["shuffle_write_bytes"] / base_sf,
        "disk_spill_per_sf": big["disk_spill_bytes"] / base_sf,
    }
    denom = sum(per_sf.values())
    ceiling_sf = free / denom if denom else float("inf")
    summary = {
        "free_bytes": free,
        "per_sf": {k: int(v) for k, v in per_sf.items()},
        "ceiling_sf": round(ceiling_sf, 1),
        "runs": {k: {kk: vv for kk, vv in v.items() if kk != "sf_dir"}
                 for k, v in sf_of.items()},
    }
    print(json.dumps(summary, separators=(",", ":")), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
