"""Streaming-sketch scale probe (VERDICT r7 task #5).

The equivalence tests run the HLL/CM twins over 3 toy micro-batches;
this measures them at realistic register scale: the sf0.1 events
table (user_id stream) split into 120+ micro-batches, merged under the
ROCKSDB state-store provider, recording per-batch trigger overhead and
the state-store row/byte footprint as the stream ages — the
measurement behind streaming_sketch.py's "state is O(registers),
independent of stream length" claim.

    python tools/bench_sketch_stream.py [n_batches]

Prints one JSON line per twin; paste into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def run_twin(spark, twin: str, src: str, n_batches: int) -> dict:
    from sequin_spark.datapipe.streaming_sketch import (
        streaming_cm_counters,
        streaming_hll_registers,
    )

    tmp = tempfile.mkdtemp(prefix=f"sketch_stream_{twin}_")
    stream = (spark.readStream.schema("v string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    make = {"hll": streaming_hll_registers,
            "cm": streaming_cm_counters}[twin]
    name = f"sketch_scale_{twin}"
    q = (make(stream, "v").writeStream.format("memory").queryName(name)
         .option("checkpointLocation", os.path.join(tmp, "ckpt"))
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        progress = q.recentProgress
        # recentProgress caps at ~100 entries; read durations from it
        durs = [p["durationMs"]["triggerExecution"] for p in progress
                if p.get("numInputRows", 0) > 0]
        state = [p["stateOperators"][0] for p in progress
                 if p.get("stateOperators")]
        rows_total = [s["numRowsTotal"] for s in state]
        mem_bytes = [s.get("memoryUsedBytes", 0) for s in state]
        out_rows = spark.table(name).count()
    finally:
        q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    durs_sorted = sorted(durs)
    mid = durs_sorted[len(durs_sorted) // 2] if durs_sorted else -1
    return {
        "twin": twin,
        "n_batches_observed": len(durs),
        "batch_ms_p50": mid,
        "batch_ms_last10_avg": round(sum(durs[-10:]) / max(
            len(durs[-10:]), 1), 1),
        "batch_ms_first10_avg": round(sum(durs[:10]) / max(
            len(durs[:10]), 1), 1),
        "state_rows_first": rows_total[0] if rows_total else -1,
        "state_rows_last": rows_total[-1] if rows_total else -1,
        "state_bytes_last": mem_bytes[-1] if mem_bytes else -1,
        "register_rows_out": out_rows,
    }


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    from pyspark.sql import functions as F

    from sequin_spark.cdc import load_table
    from sequin_spark.session import enable_rocksdb_state, get_spark

    spark = get_spark("bench_sketch_stream")
    spark.sparkContext.setLogLevel("ERROR")
    enable_rocksdb_state(spark)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    src = tempfile.mkdtemp(prefix="sketch_stream_src_")
    # one parquet file per micro-batch, round-robin over the stream
    ev = (load_table(spark, sf_dir, "events")
          .select(F.col("user_id").cast("string").alias("v")))
    n_rows = ev.count()
    (ev.repartition(n_batches).write.mode("overwrite").parquet(src))
    # repartition(n) → n files; each becomes one micro-batch
    files = [f for f in os.listdir(src) if f.endswith(".parquet")]
    print(f"source: {n_rows} rows in {len(files)} files "
          f"(1 file = 1 micro-batch), provider=rocksdb", flush=True)

    results = []
    for twin in ("hll", "cm"):
        r = run_twin(spark, twin, src, n_batches)
        r["stream_rows"] = n_rows
        results.append(r)
        print("SKETCH_SCALE " + json.dumps(r), flush=True)
    shutil.rmtree(src, ignore_errors=True)
    print("\nSKETCH_SCALE_ALL " + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
