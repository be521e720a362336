"""Streaming sketch twins: KMV/HLL/count-min registers merged ACROSS
micro-batches must equal the batch sketch over the union of all batches
— exactly, register for register (the folds are associative, so any
micro-batch split of the input is equivalent; the tests use overlapping
batches so the merge actually has work to do).  The KMV/HLL twins also
run under the RocksDB state store provider (the 100 TB setting)."""

import pytest
from pyspark.sql import functions as F

from sequin_spark.datapipe.sketch import (
    cm_counters,
    cm_point_estimates,
    hll_estimate,
    hll_registers,
    kmv_distinct,
)
from sequin_spark.datapipe.streaming_sketch import (
    streaming_cm_counters,
    streaming_hll_registers,
    streaming_kmv_finalize,
    streaming_kmv_state,
)

# three overlapping batches: values recur across micro-batches, so a
# twin that failed to merge state (or double-merged it) diverges
BATCHES = [
    [f"u{i}" for i in range(0, 400)],
    [f"u{i}" for i in range(200, 700)],          # 200 replays + 300 new
    [f"u{i}" for i in range(650, 900)] + ["u0"],  # more replays + new
]


def _write_batch(spark, src, vals):
    spark.createDataFrame([(v,) for v in vals], "v string") \
        .coalesce(1).write.mode("append").parquet(src)


def _union_df(spark):
    allv = [v for b in BATCHES for v in b]
    return spark.createDataFrame([(v,) for v in allv], "v string")


def _run_stream(spark, tmp_path, make_query, output_mode, name):
    src = str(tmp_path / "src")
    _write_batch(spark, src, BATCHES[0])
    stream = (spark.readStream.schema("v string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (make_query(stream).writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode(output_mode).start())
    try:
        q.processAllAvailable()
        for batch in BATCHES[1:]:
            _write_batch(spark, src, batch)
            q.processAllAvailable()
        return spark.table(name).collect()
    finally:
        q.stop()


def _rows_set(rows, cols):
    return {tuple(r[c] for c in cols) for r in rows}


def test_streaming_hll_equals_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path,
                      lambda s: streaming_hll_registers(s, "v"),
                      "complete", "hll_twin_out")
    want = hll_registers(_union_df(spark), "v").collect()
    assert _rows_set(got, ["register", "max_rho"]) == \
        _rows_set(want, ["register", "max_rho"])
    # and the derived estimate row is identical
    got_est = hll_estimate(
        spark.createDataFrame(got, "register int, max_rho int")).collect()
    want_est = hll_estimate(hll_registers(_union_df(spark), "v")).collect()
    assert got_est == want_est


def test_streaming_cm_equals_batch(spark, tmp_path):
    got = _run_stream(spark, tmp_path,
                      lambda s: streaming_cm_counters(s, "v"),
                      "complete", "cm_twin_out")
    want = cm_counters(_union_df(spark), "v").collect()
    assert _rows_set(got, ["row", "bucket", "cnt"]) == \
        _rows_set(want, ["row", "bucket", "cnt"])
    # point estimates from the streamed counters match batch exactly
    counters = spark.createDataFrame(got, "row int, bucket int, cnt long")
    cands = spark.createDataFrame([("u0",), ("u250",), ("zzz",)], "v string")
    got_pts = cm_point_estimates(counters, cands, "v").collect()
    want_pts = cm_point_estimates(
        cm_counters(_union_df(spark), "v"), cands, "v").collect()
    assert _rows_set(got_pts, ["v", "cm_estimate"]) == \
        _rows_set(want_pts, ["v", "cm_estimate"])


def _latest_kmv_states(spark, rows):
    df = spark.createDataFrame(
        rows, "salt int, n_updates long, min_hashes array<long>")
    from pyspark.sql import Window
    w = Window.partitionBy("salt").orderBy(F.col("n_updates").desc())
    return (df.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1").drop("rn"))


def test_streaming_kmv_equals_batch(spark, tmp_path):
    k = 64  # < total distinct (900) so the estimate path is exercised
    got_rows = _run_stream(
        spark, tmp_path, lambda s: streaming_kmv_state(s, "v", k=k),
        "update", "kmv_twin_out")
    est = streaming_kmv_finalize(
        _latest_kmv_states(spark, got_rows), k=k).collect()
    want = kmv_distinct(_union_df(spark), "v", k=k).collect()
    assert est == want
    assert est[0]["k"] == k and est[0]["est_distinct"] > 0


def test_streaming_kmv_small_stream_is_exact(spark, tmp_path):
    """Fewer distinct values than k: the estimate must be the EXACT
    distinct count, streamed or not."""
    k = 1024
    got_rows = _run_stream(
        spark, tmp_path, lambda s: streaming_kmv_state(s, "v", k=k),
        "update", "kmv_exact_out")
    est = streaming_kmv_finalize(
        _latest_kmv_states(spark, got_rows), k=k).collect()
    n_distinct = len({v for b in BATCHES for v in b})
    assert n_distinct < k
    assert est[0]["est_distinct"] == float(n_distinct)


@pytest.mark.parametrize("twin", ["hll", "kmv"])
def test_streaming_sketch_under_rocksdb(spark, tmp_path, twin):
    """The register merges hold under the RocksDB state store — keyed
    sketch state on executor disk, the 100 TB provider."""
    from sequin_spark.session import ROCKSDB_PROVIDER, enable_rocksdb_state

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    enable_rocksdb_state(spark)
    try:
        if twin == "hll":
            got = _run_stream(spark, tmp_path,
                              lambda s: streaming_hll_registers(s, "v"),
                              "complete", "hll_rocks_out")
            want = hll_registers(_union_df(spark), "v").collect()
            assert _rows_set(got, ["register", "max_rho"]) == \
                _rows_set(want, ["register", "max_rho"])
        else:
            got_rows = _run_stream(
                spark, tmp_path,
                lambda s: streaming_kmv_state(s, "v", k=64),
                "update", "kmv_rocks_out")
            est = streaming_kmv_finalize(
                _latest_kmv_states(spark, got_rows), k=64).collect()
            assert est == kmv_distinct(_union_df(spark), "v", k=64).collect()
        assert spark.conf.get(key) == ROCKSDB_PROVIDER
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_streaming_reservoir_equals_batch(spark, tmp_path):
    """The streaming reservoir (per-salt k-min state carrying key
    values) finalizes to EXACTLY the batch hash-order-statistic
    sample of the same rows — same membership, any micro-batch split,
    replays included."""
    from sequin_spark.datapipe.sampling import reservoir_sample
    from sequin_spark.datapipe.streaming_sketch import (
        streaming_reservoir_finalize,
        streaming_reservoir_state,
    )

    k = 40
    got_rows = _run_stream(
        spark, tmp_path, lambda s: streaming_reservoir_state(s, "v", k=k),
        "update", "resv_twin_out")
    from pyspark.sql import Window
    w = Window.partitionBy("salt").orderBy(F.col("n_updates").desc())
    latest = (spark.createDataFrame(
        got_rows, "salt int, n_updates long, min_hashes array<long>, "
                  "min_keys array<string>")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").drop("rn"))
    got = sorted(r["v"] for r in
                 streaming_reservoir_finalize(latest, k=k).collect())
    want = sorted(
        r["v"] for r in
        reservoir_sample(_union_df(spark).distinct(), "v", k).collect())
    assert got == want and len(got) == k


def test_streaming_kmv_survives_checkpoint_restart(spark, tmp_path):
    """Kill the streaming query between micro-batches and restart from
    the checkpoint: the per-salt k-min state must be RESTORED (not
    rebuilt from the post-restart batches alone), so the finalized
    estimate still equals the batch sketch over ALL batches.  This is
    the restart contract the state store exists for."""
    k = 64
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    emissions: list = []

    def start():
        stream = (spark.readStream.schema("v string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        return (streaming_kmv_state(stream, "v", k=k)
                .writeStream
                # foreachBatch: the memory sink refuses checkpoint
                # recovery; collecting per-batch keeps restart support
                .foreachBatch(
                    lambda df, _id: emissions.extend(df.collect()))
                .option("checkpointLocation", ckpt)
                .outputMode("update").start())

    _write_batch(spark, src, BATCHES[0])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batches 2..3 arrive while the query is DOWN; the restart must
    # resume from checkpointed state + offsets
    for batch in BATCHES[1:]:
        _write_batch(spark, src, batch)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    est = streaming_kmv_finalize(
        _latest_kmv_states(spark, emissions), k=k).collect()
    assert est == kmv_distinct(_union_df(spark), "v", k=k).collect()


def test_streaming_hll_per_key_equals_batch(spark, tmp_path):
    """Per-key HLL registers maintained across micro-batches equal the
    batch per-key sketch — the group-wise distinct counter 'merged in
    anger': state key = (group, register), one max-fold streaming
    aggregation; finalize runs on the materialized registers (the KMV
    pattern, shared arithmetic)."""
    from sequin_spark.datapipe.sketch import (
        hll_per_key,
        hll_per_key_finalize,
        hll_per_key_registers,
    )

    src = str(tmp_path / "src")
    batches = [
        [("a", f"u{i}") for i in range(0, 200)]
        + [("b", f"u{i}") for i in range(0, 40)],
        [("a", f"u{i}") for i in range(100, 350)]   # replays + new
        + [("b", f"u{i}") for i in range(20, 60)],
        [("a", f"u{i}") for i in range(300, 400)]
        + [("b", f"u{i}") for i in range(0, 80)],
    ]

    def write(vals):
        spark.createDataFrame(vals, "g string, v string") \
            .coalesce(1).write.mode("append").parquet(src)

    write(batches[0])
    stream = (spark.readStream.schema("g string, v string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (hll_per_key_registers(stream, "g", "v")
         .writeStream.format("memory").queryName("hll_pk_twin")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            write(b)
            q.processAllAvailable()
        regs = spark.createDataFrame(
            spark.table("hll_pk_twin").collect(),
            "g string, register int, max_rho int")
    finally:
        q.stop()

    got = {(r["g"], r["s_int"], r["est_distinct"])
           for r in hll_per_key_finalize(regs, "g").collect()}
    allv = [v for b in batches for v in b]
    want = {(r["g"], r["s_int"], r["est_distinct"])
            for r in hll_per_key(
                spark.createDataFrame(allv, "g string, v string"),
                "g", "v").collect()}
    assert got == want
