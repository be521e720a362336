"""One-off profiler for the streaming micro-batch path: wraps
DeliveryEngine.process_batch with section timers and runs the bench
streaming harness for ~30s, printing per-batch timings."""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sequin_spark.session import get_spark  # noqa: E402
from sequin_spark.plans.spec import ConsumerSpec  # noqa: E402
from sequin_spark.sources.rate_cdc import benchmark_stream  # noqa: E402
from sequin_spark.streaming import delivery as dmod  # noqa: E402
from sequin_spark.streaming.pipeline import ConsumerPipeline  # noqa: E402

TIMINGS = []
orig = dmod.DeliveryEngine.process_batch


def patched(self, batch_df, batch_id):
    t = {}
    t0 = time.perf_counter()
    n_ledger_files = (
        len(os.listdir(self.ledger_dir)) if os.path.isdir(self.ledger_dir) else 0
    )
    ledger = self.read_ledger(batch_df.sparkSession)
    n_ledger_rows = ledger.count() if ledger is not None else 0
    t["ledger_read_count"] = time.perf_counter() - t0

    t1 = time.perf_counter()
    stats = orig(self, batch_df, batch_id)
    t["process_batch"] = time.perf_counter() - t1
    TIMINGS.append(
        (batch_id, stats.get("delivered", 0), n_ledger_files, n_ledger_rows, t)
    )
    return stats


dmod.DeliveryEngine.process_batch = patched

spark = get_spark("profile_stream")
spark.sparkContext.setLogLevel("ERROR")
tmp = tempfile.mkdtemp(prefix="sequin_prof_")
stream = benchmark_stream(spark, rows_per_second=50_000, num_partitions=8)
spec = ConsumerSpec(name="bench_stream", sink_type="benchmark", batch_size=200)
pipe = ConsumerPipeline(spec, state_dir=f"{tmp}/state")
q = pipe.start_stream(stream, checkpoint_dir=f"{tmp}/ckpt", trigger_seconds=1)
time.sleep(35)
q.stop()

for bid, delivered, files, rows, t in TIMINGS:
    print(
        f"batch={bid} delivered={delivered} ledger_files={files} "
        f"ledger_rows={rows} ledger_probe={t['ledger_read_count']:.2f}s "
        f"body={t['process_batch']:.2f}s"
    )
