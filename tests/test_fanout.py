"""Consumer fan-out: N independent ConsumerPipelines over ONE event
stream (the reference runs one Broadway pipeline per SinkConsumer over
the same replication slot) — each with its own filter, checkpoint,
state and sink; deliveries don't interfere."""

import json

from pyspark.sql import functions as F

from sequin_spark.cdc import eventize_orders
from sequin_spark.plans.spec import ConsumerSpec
from sequin_spark.streaming.pipeline import ConsumerPipeline


def _keys(out_dir):
    rows = []
    if not out_dir.exists():
        return rows
    for f in out_dir.iterdir():
        rows += [int(json.loads(json.loads(line)["value"])["o_orderkey"])
                 for line in f.read_text().splitlines()]
    return rows


def test_two_consumers_one_stream(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    ev = eventize_orders(spark, sf_dir).limit(120).localCheckpoint()
    ev.coalesce(1).write.mode("append").parquet(str(src))
    schema = ev.schema

    # consumer A: inserts only; consumer B: deletes only — disjoint
    specs = {
        "a": ConsumerSpec(
            name="fan-a", sink_type="file_log",
            sink_config={"path": str(tmp_path / "out_a")},
            actions=["insert"], transform="record_only"),
        "b": ConsumerSpec(
            name="fan-b", sink_type="file_log",
            sink_config={"path": str(tmp_path / "out_b")},
            actions=["delete"], transform="record_only"),
    }
    queries = []
    try:
        for tag, spec in specs.items():
            pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / f"st_{tag}"))
            stream = spark.readStream.schema(schema).parquet(str(src))
            queries.append(pipe.start_stream(
                stream, checkpoint_dir=str(tmp_path / f"ck_{tag}")))
        for q in queries:
            q.processAllAvailable()
    finally:
        for q in queries:
            q.stop()

    want_a = sorted(
        int(r["k"]) for r in ev.filter(F.col("action") == "insert")
        .select(F.col("record")["o_orderkey"].alias("k")).collect())
    want_b = sorted(
        int(r["k"]) for r in ev.filter(F.col("action") == "delete")
        .select(F.col("record")["o_orderkey"].alias("k")).collect())
    got_a = sorted(_keys(tmp_path / "out_a"))
    got_b = sorted(_keys(tmp_path / "out_b"))
    assert got_a == want_a and got_b == want_b
    # disjoint action filters → no overlap between the two sinks
    assert not (set(got_a) & set(got_b))
