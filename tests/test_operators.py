"""Operator unit tests — semantics corpus modeled on the reference's
consumers_test.exs / slot_message_store_state_test.exs coverage."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sequin_spark.operators.changes import UNCHANGED_TOAST, compute_changes, fill_toast
from sequin_spark.operators.column_filter import ColumnFilter, apply_column_filters
from sequin_spark.operators.dedup import dedup_replays, ledger_anti_join
from sequin_spark.operators.grouping import deliverable_messages, order_within_groups
from sequin_spark.operators.source_filter import Source, apply_action_filter, apply_source_filter


def _events(spark, rows):
    return spark.createDataFrame(rows)


def test_source_include_exclude_mutually_exclusive():
    with pytest.raises(ValueError):
        Source(include_schemas=["a"], exclude_schemas=["b"])
    with pytest.raises(ValueError):
        Source(include_tables=["a"], exclude_table_oids=[1])


def test_source_filter_exclude_wins(spark):
    df = _events(
        spark,
        [
            Row(table_schema="public", table_name="a", table_oid=1),
            Row(table_schema="public", table_name="b", table_oid=2),
            Row(table_schema="private", table_name="a", table_oid=3),
        ],
    )
    out = apply_source_filter(df, Source(include_schemas=["public"], exclude_tables=["b"]))
    assert {r.table_oid for r in out.collect()} == {1}


def test_action_filter_read_passthrough(spark):
    df = _events(
        spark,
        [Row(action="insert"), Row(action="update"), Row(action="delete"), Row(action="read")],
    )
    out = apply_action_filter(df, ["insert"])
    assert {r.action for r in out.collect()} == {"insert", "read"}


def test_column_filter_operators(spark):
    df = spark.createDataFrame(
        [
            Row(record={"age": "30", "name": "Arya", "meta": '{"a": {"b": 5}}'}),
            Row(record={"age": "10", "name": "BRAN", "meta": '{"a": {"b": 50}}'}),
            Row(record={"age": None, "name": "Sansa", "meta": None}),
        ]
    )
    got = apply_column_filters(df, [ColumnFilter("age", ">", 20, "integer")]).count()
    assert got == 1
    got = apply_column_filters(df, [ColumnFilter("name", "==", "bran", "cistring")]).count()
    assert got == 1
    got = apply_column_filters(df, [ColumnFilter("age", "is_null")]).count()
    assert got == 1
    got = apply_column_filters(df, [ColumnFilter("age", "not_null")]).count()
    assert got == 2
    got = apply_column_filters(df, [ColumnFilter("name", "in", ["Arya", "Sansa"])]).count()
    assert got == 2
    # NULL fails not_in membership (reference semantics)
    got = apply_column_filters(df, [ColumnFilter("age", "not_in", ["30"], "string")]).count()
    assert got == 1
    got = apply_column_filters(
        df, [ColumnFilter("meta", ">=", 10, "integer", jsonb_path="a.b")]
    ).count()
    assert got == 1
    with pytest.raises(ValueError):
        ColumnFilter("x", "like", "y")


def test_changes_diff_semantics(spark):
    df = spark.createDataFrame(
        [
            Row(action="update", record={"a": "2", "b": "x", "t": UNCHANGED_TOAST},
                old_record={"a": "1", "b": "x", "t": "big"}),
            Row(action="insert", record={"a": "1"}, old_record=None),
        ]
    )
    out = {r.action: r.changes for r in compute_changes(df).collect()}
    # only genuinely-changed cols; unchanged + TOAST-marker cols excluded
    assert out["update"] == {"a": "1"}
    assert out["insert"] is None

    filled = fill_toast(df.filter(F.col("action") == "update")).collect()[0].record
    assert filled == {"a": "2", "b": "x", "t": "big"}


def test_group_ordering_and_deliverable(spark):
    rows = [
        Row(group_id="g1", commit_lsn=10, commit_idx=1, v="second"),
        Row(group_id="g1", commit_lsn=10, commit_idx=0, v="first"),
        Row(group_id="g2", commit_lsn=5, commit_idx=0, v="g2-first"),
        Row(group_id=None, commit_lsn=99, commit_idx=0, v="nogroup-a"),
        Row(group_id=None, commit_lsn=98, commit_idx=0, v="nogroup-b"),
    ]
    df = spark.createDataFrame(rows)
    seqs = {(r.group_id, r.v): r.deliver_seq for r in order_within_groups(df).collect()}
    assert seqs[("g1", "first")] == 1 and seqs[("g1", "second")] == 2
    heads = {r.v for r in deliverable_messages(df).collect()}
    # null-group rows each deliverable independently
    assert heads == {"first", "g2-first", "nogroup-a", "nogroup-b"}


def test_dedup_and_ledger(spark):
    rows = [
        Row(action="insert", commit_lsn=1, commit_idx=0),
        Row(action="insert", commit_lsn=1, commit_idx=0),
        Row(action="update", commit_lsn=1, commit_idx=1),
        Row(action="read", commit_lsn=0, commit_idx=0),
    ]
    df = spark.createDataFrame(rows)
    assert dedup_replays(df).count() == 3

    delivered = spark.createDataFrame([Row(commit_lsn=1, commit_idx=1)])
    out = ledger_anti_join(df, delivered)
    # update filtered by ledger; read bypasses; duplicate insert rows both kept
    assert sorted(r.action for r in out.collect()) == ["insert", "insert", "read"]


def test_asof_join_semantics(spark):
    """Nearest-earlier semantics: ties at equal ts included, greatest
    order wins among ties, no-prior-right rows get null payload, keys
    never bleed into each other."""
    from sequin_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("u1", 100, 10), ("u1", 200, 11), ("u2", 150, 12), ("u3", 50, 13)],
        "user string, ts_us long, event_id long",
    )
    right = spark.createDataFrame(
        [
            ("u1", 90, 1, "a"), ("u1", 100, 2, "b"), ("u1", 100, 3, "c"),
            ("u1", 180, 4, "d"), ("u2", 160, 5, "e"),
        ],
        "user string, ts_us long, event_id long, tag string",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, key_cols=["user"], ts_col="ts_us",
            order_col="event_id", right_payload=["tag"],
        ).collect()
    }
    assert out[10]["event_id_asof"] == 3 and out[10]["tag_asof"] == "c"  # tie: max id
    assert out[11]["event_id_asof"] == 4 and out[11]["tag_asof"] == "d"
    assert out[12]["event_id_asof"] is None  # u2's click is AFTER the purchase
    assert out[13]["event_id_asof"] is None  # u3 has no right rows at all


def test_asof_join_plan_single_shuffle(spark):
    """The physical plan is window-over-union — no nested-loop range join."""
    import contextlib, io

    from sequin_spark.operators.asof import asof_join

    left = spark.range(10).selectExpr("'k' AS user", "id AS ts_us", "id AS event_id")
    right = spark.range(10).selectExpr("'k' AS user", "id AS ts_us", "id + 100 AS event_id")
    out = asof_join(left, right, ["user"], "ts_us", "event_id", [])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_sessionize_gap_boundaries(spark):
    from sequin_spark.operators.asof import sessionize

    df = spark.createDataFrame(
        [
            ("u1", 0, 1), ("u1", 10, 2), ("u1", 200, 3),   # gap 190 > 100 → new session
            ("u1", 250, 4), ("u2", 5, 5),
        ],
        "user string, ts long, event_id long",
    )
    out = {r["event_id"]: r for r in sessionize(df, ["user"], "ts", gap=100).collect()}
    assert out[1]["session_seq"] == 0 and out[2]["session_seq"] == 0
    assert out[3]["session_seq"] == 1 and out[4]["session_seq"] == 1
    assert out[5]["session_seq"] == 0  # fresh key starts at 0
    assert out[3]["session_start_ts"] == 200 and out[4]["session_start_ts"] == 200


def test_funnel_strict_ordering(spark):
    """Earliest-match semantics: a user converts to step i only with an
    event strictly after step i-1; out-of-order events don't count."""
    from sequin_spark.operators.funnel import funnel_conversion, funnel_times

    rows = [
        # u1 completes in order
        (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
        # u2 clicked BEFORE viewing — click must not count; later click does
        (2, "click", 5), (2, "view", 10), (2, "click", 40),
        # u3 purchase before click → no purchase conversion
        (3, "view", 10), (3, "purchase", 15), (3, "click", 20),
        # u4 never views → not in funnel at all
        (4, "click", 1), (4, "purchase", 2),
        # u5 simultaneous view/click (tie) → strict > rejects the click
        (5, "view", 10), (5, "click", 10),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts_us long")
    t = {r.user_id: r for r in
         funnel_times(ev, ["view", "click", "purchase"], ts_col="ts_us").collect()}
    assert set(t) == {1, 2, 3, 5}
    assert (t[1].t_1, t[1].t_2, t[1].t_3) == (10, 20, 30)
    assert (t[2].t_1, t[2].t_2, t[2].t_3) == (10, 40, None)
    assert (t[3].t_1, t[3].t_2, t[3].t_3) == (10, 20, None)
    assert (t[5].t_1, t[5].t_2, t[5].t_3) == (10, None, None)

    conv = {r.step: r for r in
            funnel_conversion(ev, ["view", "click", "purchase"], ts_col="ts_us").collect()}
    assert conv[1].n_users == 4 and conv[1].pct_of_first == 1.0
    assert conv[2].n_users == 3 and conv[2].pct_of_prev == 0.75
    assert conv[3].n_users == 1 and conv[3].pct_of_first == 0.25


def test_cohort_retention_buckets(spark):
    from sequin_spark.operators.funnel import cohort_retention

    WEEK = 7 * 24 * 3600 * 1_000_000
    rows = [
        # cohort 0: u1 active weeks 0,1,2 ; u2 active week 0 only
        (1, 0), (1, WEEK + 5), (1, 2 * WEEK + 5),
        (2, 10),
        # cohort 1: u3 active weeks 1 and 3 (offset 0 and 2)
        (3, WEEK + 1), (3, 3 * WEEK + 1),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_us long")
    got = {(r.cohort, r.week_offset): r for r in cohort_retention(ev, ts_col="ts_us").collect()}
    assert got[(0, 0)].n_active == 2 and got[(0, 0)].retention == 1.0
    assert got[(0, 1)].n_active == 1 and got[(0, 1)].retention == 0.5
    assert got[(0, 2)].n_active == 1
    assert got[(1, 0)].n_active == 1 and got[(1, 2)].retention == 1.0
    assert (1, 1) not in got


def test_funnel_differential_random(spark):
    """Differential: funnel_times over random event streams must equal a
    pure-Python earliest-match reference (one deterministic seed sweep,
    batch-Spark vs sequential scan)."""
    import random

    from sequin_spark.operators.funnel import funnel_times

    steps = ["a", "b", "c"]
    rng = random.Random(42)
    rows = []
    for uid in range(40):
        n = rng.randint(0, 12)
        ts = 0
        for _ in range(n):
            ts += rng.randint(1, 5)
            rows.append((uid, rng.choice(["a", "b", "c", "x"]), ts))
    # ties across users are fine; within a user ts strictly increases

    def py_funnel(evts):
        times = {}
        for uid in {r[0] for r in evts}:
            seq = sorted((r[2], r[1]) for r in evts if r[0] == uid)
            t = [None, None, None]
            for ts, typ in seq:
                i = next((j for j in range(3) if t[j] is None), None)
                if i is None:
                    break
                if typ == steps[i] and (i == 0 or ts > t[i - 1]):
                    t[i] = ts
            if t[0] is not None:
                times[uid] = tuple(t)
        return times

    expected = py_funnel(rows)
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3)
        for r in funnel_times(
            spark.createDataFrame(rows, "user_id long, event_type string, ts_us long"),
            steps, ts_col="ts_us",
        ).collect()
    }
    assert got == expected


def test_interval_bin_join_matches_naive(spark):
    """Binned interval join must equal the naive range predicate on
    overlapping, touching, and disjoint intervals — including values
    exactly on interval boundaries — and never use a cartesian plan."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from sequin_spark.operators.rangejoin import interval_bin_join

    ev = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(
            [0.0, 1.0, 2.5, 5.0, 5.0001, 7.5, 10.0, -3.0, 100.0])],
        "event_id long, value double")
    iv = spark.createDataFrame(
        [(0, 0.0, 5.0), (1, 2.5, 7.5), (2, 5.0, 10.0), (3, 50.0, 60.0),
         (4, -10.0, -1.0)],
        "band_id int, lo double, hi double")
    for bin_width in (0.7, 2.0, 5.0, 20.0):
        got = {(r["event_id"], r["band_id"]) for r in
               interval_bin_join(ev, iv, "value",
                                 bin_width=bin_width).collect()}
        want = {(r["event_id"], r["band_id"]) for r in
                ev.crossJoin(iv).filter(
                    (F.col("value") >= F.col("lo"))
                    & (F.col("value") <= F.col("hi"))).collect()}
        assert got == want, f"bin_width={bin_width}"
    # plan: equi-join on the bin, not a cartesian product
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        interval_bin_join(ev, iv, "value", bin_width=2.0).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_bin_join_hypothesis(spark):
    """Property: for ANY intervals/events/bin width, binned join ==
    naive range predicate (run as one batched Spark differential over
    many generated cases to keep JVM round-trips off the hot path)."""
    import random

    from pyspark.sql import functions as F

    from sequin_spark.operators.rangejoin import interval_bin_join

    rnd = random.Random(13)
    for case in range(6):
        n_ev = rnd.randint(0, 60)
        n_iv = rnd.randint(0, 12)
        scale = rnd.choice([1.0, 37.5, 1000.0])
        ev_rows = [(i, round(rnd.uniform(-2, 2) * scale, 3))
                   for i in range(n_ev)]
        iv_rows = []
        for b in range(n_iv):
            lo = round(rnd.uniform(-2, 2) * scale, 3)
            iv_rows.append((b, lo, round(lo + rnd.uniform(0, 1.5) * scale, 3)))
        ev = spark.createDataFrame(ev_rows or [(0, 0.0)],
                                   "event_id long, value double")
        if n_ev == 0:
            ev = ev.filter("event_id < 0")
        iv = spark.createDataFrame(iv_rows or [(0, 0.0, 0.0)],
                                   "band_id int, lo double, hi double")
        if n_iv == 0:
            iv = iv.filter("band_id < 0")
        bw = rnd.choice([0.1, 1.0, 10.0]) * scale
        got = {(r["event_id"], r["band_id"]) for r in
               interval_bin_join(ev, iv, "value", bin_width=bw).collect()}
        want = {(r["event_id"], r["band_id"]) for r in
                ev.crossJoin(iv).filter(
                    (F.col("value") >= F.col("lo"))
                    & (F.col("value") <= F.col("hi"))).collect()}
        assert got == want, f"case={case} bw={bw}"


# --- CDC-over-backfill produce prioritization (r12 verdict task #4 port:
# slot_message_store_state_test.exs:975-1145) ------------------------------

MSG_SCHEMA = ("group_id string, commit_lsn long, commit_idx long, "
              "is_backfill boolean")


def _msgs(spark, rows):
    return spark.createDataFrame(
        [Row(group_id=g, commit_lsn=l, commit_idx=i, is_backfill=b)
         for g, l, i, b in rows], MSG_SCHEMA)


def _produced(spark, rows, **kw):
    from sequin_spark.operators.grouping import (
        produce_order_with_cdc_priority,
    )

    out = produce_order_with_cdc_priority(_msgs(spark, rows), **kw)
    return [(r["group_id"], r["commit_lsn"], r["commit_idx"],
             r["is_backfill"])
            for r in out.orderBy("produce_rank").collect()]


def test_cdc_prioritized_over_backfill_when_safe(spark):
    """slot_message_store_state_test.exs:976 — disjoint groups: the
    CDC messages produce first despite LOWER backfill cursors."""
    rows = [("g1", 1, 0, True), ("g2", 1, 1, True),
            ("g3", 2, 0, False), ("g4", 2, 1, False)]
    got = _produced(spark, rows)
    assert [g for g, *_ in got] == ["g3", "g4", "g1", "g2"]
    assert [b for *_, b in got] == [False, False, True, True]


def test_cdc_not_prioritized_on_group_conflict(spark):
    """slot_message_store_state_test.exs:1004 — one group holds both a
    backfill head and a later CDC message: the store switches to plain
    cursor order entirely, the backfill head produces first, and the
    same-group CDC message stays blocked behind it."""
    rows = [("g1", 1, 0, True),     # backfill head of g1
            ("g1", 2, 0, False),    # CDC in the SAME group: blocked
            ("g2", 3, 0, False)]    # CDC in another group
    got = _produced(spark, rows)
    # plain cursor order: g1's backfill first (lsn 1), then g2 (lsn 3);
    # g1's CDC is not a deliverable head at all
    assert got == [("g1", 1, 0, True), ("g2", 3, 0, False)]


def test_cdc_priority_null_groups_never_conflict(spark):
    """Null group_ids are independent singletons: a null-group backfill
    plus a null-group CDC message must NOT flip the store into
    conflict mode — CDC still produces first."""
    rows = [(None, 1, 0, True), (None, 2, 0, False),
            ("g9", 1, 5, True), ("g8", 9, 0, False)]
    got = _produced(spark, rows)
    assert [b for *_, b in got] == [False, False, True, True]


def test_cdc_priority_batch_size_and_order_within_group(spark):
    """strict cursor ordering within a group across CDC and backfill
    (slot_message_store_state_test.exs:1145) + the per-partition
    produce cap: only heads produce, capped at batch_size."""
    rows = [("a", 5, 0, False), ("a", 6, 0, False),   # a: two CDC
            ("b", 1, 0, True), ("c", 7, 0, False)]
    got = _produced(spark, rows, batch_size=2)
    # no conflict (no group mixes kinds): CDC heads first in cursor
    # order — a@5 then c@7; cap 2 excludes the backfill b@1
    assert got == [("a", 5, 0, False), ("c", 7, 0, False)]


def test_cdc_priority_is_partition_local(spark):
    """The reference shards stores partition_count ways and each
    partition prioritizes independently: a conflict in one store
    partition must not disable prioritization in the others."""
    from pyspark.sql import functions as F

    from sequin_spark.operators.grouping import (
        produce_order_with_cdc_priority,
    )

    # one conflicted group ("cx") + many safe groups; with
    # partition_count=4 the conflict flips only cx's partition
    rows = [("cx", 1, 0, True), ("cx", 2, 0, False)]
    rows += [(f"s{i}", 10 + i, 0, True) for i in range(8)]     # backfill
    rows += [(f"t{i}", 50 + i, 0, False) for i in range(8)]    # CDC
    df = _msgs(spark, rows)
    pc = 4
    out = produce_order_with_cdc_priority(df, partition_count=pc)
    part_of = {
        r["group_id"]: r["p"]
        for r in df.select(
            "group_id",
            F.pmod(F.hash("group_id"), F.lit(pc)).alias("p")).collect()}
    conflicted = {part_of["cx"]}
    by_part = {}
    for r in out.collect():
        by_part.setdefault(part_of[r["group_id"]], []).append(
            (r["produce_rank"], r["is_backfill"], r["commit_lsn"]))
    for p, lst in by_part.items():
        lst.sort()
        if p in conflicted:
            # conflict partition: plain cursor order
            assert [l for _, _, l in lst] == sorted(l for _, _, l in lst)
        else:
            # safe partition: every CDC row ranks before every backfill
            kinds = [b for _, b, _ in lst]
            assert kinds == sorted(kinds)  # False (CDC) first
