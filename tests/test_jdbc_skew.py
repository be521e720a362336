"""JDBC poller query builders + skew salting."""

from pyspark.sql import Row

from sequin_spark.operators.skew import salted_count
from sequin_spark.sources.jdbc import cdc_poll_query, snapshot_predicates


def test_cdc_poll_query_shapes():
    q0 = cdc_poll_query("cdc_log", None, limit=500)
    assert "WHERE" not in q0 and "ORDER BY commit_lsn, commit_idx LIMIT 500" in q0
    q1 = cdc_poll_query("cdc_log", (100, 5))
    assert "commit_lsn > 100" in q1 and "commit_lsn = 100 AND commit_idx > 5" in q1


def test_snapshot_predicates_disjoint_cover():
    preds = snapshot_predicates(1, 1000, 4, "id")
    assert len(preds) == 4
    assert preds[0] == "id >= 1 AND id < 251"
    assert preds[-1].startswith("id >= ")
    # last partition is open-ended → covers the tail
    assert "AND" not in preds[-1]


def test_salted_count_matches_plain(spark):
    rows = [Row(k="hot", v=i) for i in range(500)] + [Row(k="cold", v=1)]
    df = spark.createDataFrame(rows)
    got = {r.k: r.n for r in salted_count(df, "k", salt_buckets=8).collect()}
    assert got == {"hot": 500, "cold": 1}
