"""Pull-queue spill path at volume (VERDICT r8 task #10): ingest a
1 M-row backlog (sf1 events, eventized + serialized — far past the
50 k-row / 128 MB window), then drain it with the receive/ack loop,
recording ingest (distributed spill) time, drain throughput, and the
refill-latency split: a receive() that pulls spill chunks into the
window vs one served purely from memory.

The claim under test: the driver footprint is O(max_pending) no matter
the backlog — ingesting 20× the window must not collect 1 M rows to
the driver, and drain throughput must hold steady as the window cycles
through ~100 spill chunks.

Usage: python tools/bench_pullq.py [sf_dir] [batch_size]
One JSON line to stdout; paste the table into docs/SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from sequin_spark.cdc import eventize_events
    from sequin_spark.session import get_spark
    from sequin_spark.streaming.pull_queue import PullQueue

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(HERE, ".localdata", "sf1")
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    spark = get_spark("bench_pullq")
    spark.sparkContext.setLogLevel("ERROR")

    ev = eventize_events(spark, sf_dir).select(
        "group_id", "commit_lsn", "commit_idx",
        F.to_json(F.struct("action", "record")).alias("value"),
    )
    n = ev.count()
    state = tempfile.mkdtemp(prefix="pullq_bench_")
    q = PullQueue(state_dir=state, ack_wait_s=3600.0)

    t0 = time.time()
    depth = q.ingest(ev)
    ingest_s = time.time() - t0
    spilled = q.spilled()
    window = q.window_size()

    # drain: receive/ack until empty; every receive timed, refill
    # receives identified by spill-chunk count deltas
    drained = 0
    refill_lat, mem_lat = [], []
    t_drain = time.time()
    while True:
        pre_chunks = len(q._spill_chunks())
        t1 = time.time()
        msgs = q.receive(batch_size)
        dt = time.time() - t1
        if not msgs:
            break
        (refill_lat if len(q._spill_chunks()) < pre_chunks
         else mem_lat).append(dt)
        q.ack([m["ack_id"] for m in msgs])
        drained += len(msgs)
    drain_s = time.time() - t_drain
    shutil.rmtree(state, ignore_errors=True)

    def pct(lat, p):
        if not lat:
            return -1.0
        return round(sorted(lat)[min(len(lat) - 1, int(len(lat) * p))]
                     * 1000, 1)

    out = {
        "metric": "pullq_spill_1m",
        "rows": n, "depth_after_ingest": depth,
        "spilled_after_ingest": spilled, "window_after_ingest": window,
        "ingest_sec": round(ingest_s, 2),
        "drain_rows": drained, "drain_sec": round(drain_s, 2),
        "drain_rows_per_sec": int(drained / drain_s) if drain_s else 0,
        "batch_size": batch_size,
        "n_refill_receives": len(refill_lat),
        "n_mem_receives": len(mem_lat),
        "refill_receive_p50_ms": pct(refill_lat, 0.5),
        "refill_receive_p99_ms": pct(refill_lat, 0.99),
        "mem_receive_p50_ms": pct(mem_lat, 0.5),
        "mem_receive_p99_ms": pct(mem_lat, 0.99),
    }
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
