"""One-off scan: which registry queries plan a Window over an
Exchange SinglePartition (the single-task global-window funnel)?
Used to build/justify the allow-list in test_plan_quality.py."""
import contextlib
import io
import re
import sys

from pyspark.sql import SparkSession

from sequin_spark.queries import QUERIES

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def single_partition_windows(plan: str):
    lines = plan.splitlines()

    def depth(ln):
        m = re.match(r"^[\s+:|-]*", ln)
        return m.end()

    hits = []
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow\b", ln):
            continue
        d = depth(ln)
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and depth(lines[j]) <= d:
                break
            if "Exchange" in lines[j]:
                if "SinglePartition" in lines[j]:
                    hits.append(ln.strip()[:120])
                break
    return hits


for name in sorted(QUERIES):
    try:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        hits = single_partition_windows(buf.getvalue())
        if hits:
            print(f"HIT  {name}")
            for h in hits:
                print(f"     {h}")
    except Exception as e:  # noqa: BLE001
        print(f"ERR  {name}: {e}")
print("done")
