"""Backfill — bounded snapshot scans merged consistently into the stream.

Reference protocol (SURVEY §2.10; lib/sequin/runtime/table_reader.ex):

1. keyset-paginated scan: ``WHERE (sort_col, pk...) > (cursor...) ORDER BY
   sort_col, pk LIMIT page_size`` (table_reader.ex:265-298,
   keyset_cursor.ex:93-113) — pure predicate pushdown;
2. consistency fence: a batch is only merged after the high-watermark
   returns through the WAL, and snapshot rows whose PK appeared in CDC
   before the fence are dropped (CDC wins — message_handler.ex:130-148);
3. snapshot rows enter the stream as ``action='read'`` events.

Spark mapping: (1) is a filter+sort+limit that pushes down to
parquet/JDBC (on JDBC, partition the read by keyset ranges so 1000
executors scan disjoint slices); (2) is a left_anti join against the
CDC keys at/below the fence LSN (broadcast — the per-batch CDC key set
is small); (3) is a union into the canonical stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def cursor_columns(pk_cols: list[str],
                   sort_col: str | None = None) -> list[str]:
    """Cursor column order (keyset_cursor.ex cursor_columns/1): the
    sort column leads, then the PKs in attnum order; a sort column that
    IS a PK isn't repeated; no sort column ⇒ PKs alone. The pages this
    cursor walks are then strictly ordered and restartable regardless
    of which column carries the user-visible progress."""
    if sort_col is None:
        return list(pk_cols)
    return [sort_col] + [c for c in pk_cols if c != sort_col]


def cursor_from_row(cursor_cols: list[str], row) -> list:
    """Cursor value from a page's last row (keyset_cursor.ex
    cursor_from_result): positional values in cursor-column order."""
    return [row[c] for c in cursor_cols]


def keyset_predicate(cursor_cols: list[str], cursor_vals: list) -> Column:
    """Row-wise ``(c1, c2, ...) > (v1, v2, ...)`` as a Catalyst predicate.

    Expanded lexicographic form (keyset_cursor.ex:93-113) so every
    conjunct can push down to the scan:
    c1 > v1 OR (c1 = v1 AND c2 > v2) OR ...
    """
    if len(cursor_cols) != len(cursor_vals):
        raise ValueError("cursor_cols and cursor_vals must align")
    pred = None
    for i in range(len(cursor_cols)):
        eq = F.lit(True)
        for j in range(i):
            eq = eq & (F.col(cursor_cols[j]) == F.lit(cursor_vals[j]))
        clause = eq & (F.col(cursor_cols[i]) > F.lit(cursor_vals[i]))
        pred = clause if pred is None else (pred | clause)
    return pred


def keyset_page(
    df: DataFrame,
    cursor_cols: list[str],
    cursor_vals: list | None,
    page_size: int,
) -> DataFrame:
    """One backfill page: keyset filter → cursor order → limit."""
    out = df
    if cursor_vals is not None:
        out = out.filter(keyset_predicate(cursor_cols, cursor_vals))
    return out.orderBy(*[F.col(c) for c in cursor_cols]).limit(page_size)


def backfill_snapshot(df: DataFrame, table_name: str, pk_cols: list[str], table_schema: str = "public") -> DataFrame:
    """Shape a snapshot page as canonical `read` events
    (table_reader.ex:381-409 builds ConsumerEvent(action: :read))."""
    from sequin_spark.cdc import TABLE_OIDS
    from sequin_spark.schema import group_id_from_pks

    record_entries = []
    for c in df.columns:
        record_entries.append(F.lit(c))
        record_entries.append(F.col(c).cast("string"))
    pks = F.array(*[F.col(c).cast("string") for c in pk_cols])
    out = df.select(
        F.lit("read").alias("action"),
        F.create_map(*record_entries).alias("record"),
        F.lit(None).cast("map<string,string>").alias("changes"),
        F.lit(table_schema).alias("table_schema"),
        F.lit(table_name).alias("table_name"),
        F.lit(TABLE_OIDS.get(table_name, 0)).cast("long").alias("table_oid"),
        pks.alias("record_pks"),
        F.lit(0).cast("long").alias("commit_lsn"),
        F.lit(0).cast("long").alias("commit_idx"),
        F.lit(None).cast("timestamp").alias("commit_timestamp"),
        F.lit(None).cast("string").alias("trace_id"),
        F.lit(None).cast("string").alias("transaction_annotations"),
    ).withColumn("group_id", group_id_from_pks(F.col("record_pks")))
    # backfill idempotency: base64("backfill:{table}:{pks}") —
    # table_reader.ex:405 (base64(backfill_id:pk1:pk2…))
    return out.withColumn(
        "idempotency_key",
        F.base64(
            F.concat(F.lit(f"backfill:{table_name}:"), F.array_join(F.col("record_pks"), ":")).cast(
                "binary"
            )
        ),
    )


def fence_merge(snapshot: DataFrame, cdc: DataFrame, fence_lsn: int) -> DataFrame:
    """Drop snapshot rows whose PK was touched by CDC at/below the fence.

    CDC wins over the (possibly stale) snapshot read —
    message_handler.ex:66-94 (pks_seen) + 130-148 (flush on watermark).
    The CDC key set for one fence window is bounded → broadcast anti-join,
    so the snapshot side never shuffles.
    """
    seen = (
        cdc.filter(F.col("commit_lsn") <= F.lit(fence_lsn))
        .select(F.col("table_oid"), F.col("group_id").alias("_seen_gid"))
        .dropDuplicates()
    )
    return snapshot.join(
        broadcast(seen),
        (snapshot["table_oid"] == seen["table_oid"]) & (snapshot["group_id"] == seen["_seen_gid"]),
        "left_anti",
    )


BACKFILL_STATES = ("active", "paused", "completed", "cancelled", "failed")


class Backfill:
    """Backfill lifecycle + progress counters (backfill.ex:29-51,91-97):
    state machine active→{paused,completed,cancelled,failed}, counters
    rows_initial/processed/ingested."""

    def __init__(self, table_name: str, cursor_cols: list[str], rows_initial_count: int = 0):
        self.table_name = table_name
        self.cursor_cols = cursor_cols
        self.state = "active"
        self.rows_initial_count = rows_initial_count
        self.rows_processed_count = 0
        self.rows_ingested_count = 0
        self.cursor: list | None = None

    def transition(self, new_state: str) -> None:
        if new_state not in BACKFILL_STATES:
            raise ValueError(f"unknown backfill state {new_state!r}")
        if self.state in ("completed", "cancelled", "failed"):
            raise ValueError(f"cannot leave terminal state {self.state!r}")
        self.state = new_state


def run_backfill(
    spark,
    df,
    table_name: str,
    pk_cols: list[str],
    cursor_cols: list[str] | None = None,
    cdc_events=None,
    fence_lsn: int = 0,
    initial_page_size: int = 1000,
    max_pages: int | None = None,
    pk_prescan: bool = False,
    source_path: str | None = None,
):
    """Full backfill protocol (§2.10): keyset-paginate the snapshot,
    fence-merge each page against concurrent CDC, emit `read` events,
    AIMD-tune the page size, track progress. Returns (Backfill, events).

    Driver-side loop over pages mirrors the reference's TableReaderServer;
    each page is a distributed bounded read with pushed-down predicates.
    The cursor advances via ``agg(count, max(struct(cursor)))`` — the
    driver only ever sees ONE row per page (count + last cursor), never
    the page's rows; the page is sorted by the cursor columns, so the
    lexicographic struct max IS the last row's cursor.

    ``pk_prescan=True`` is fetch_batch_pks parity (table_reader.ex:
    161-203 with select_only_pk_and_cursor_columns): page over a
    PK+cursor-only projection — the scan reads just those columns
    (column pruning reaches parquet's ReadSchema / JDBC's SELECT list)
    — then fetch the full rows for the page by a broadcast semi-join on
    the PK set. Wide tables page ~10-100× cheaper; the full-row read
    touches exactly one page's PKs.
    """
    import time as _time

    from sequin_spark.sources.fast_count import count_or_estimate

    cursor_cols = cursor_cols or pk_cols
    # reltuples-style estimate when the parquet path is known
    # (table_reader.ex:333-360) — progress bars don't pay a scan
    bf = Backfill(table_name, cursor_cols,
                  rows_initial_count=count_or_estimate(df, source_path))
    opt = PageSizeOptimizer(initial=initial_page_size)
    prescan_cols = list(dict.fromkeys([*cursor_cols, *pk_cols]))
    pages = []
    n_pages = 0
    while bf.state == "active":
        t0 = _time.time()
        if pk_prescan:
            keys = keyset_page(df.select(*prescan_cols), cursor_cols, bf.cursor, opt.size)
            keys = keys.cache()
            page = df.join(broadcast(keys.select(*pk_cols)), pk_cols, "left_semi")
        else:
            page = keyset_page(df, cursor_cols, bf.cursor, opt.size).cache()
            keys = page
        last = keys.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(F.struct(*[F.col(c) for c in cursor_cols])).alias("last_cursor"),
        ).collect()[0]
        elapsed_ms = (_time.time() - t0) * 1000
        if not last["n"]:
            bf.transition("completed")
            keys.unpersist()
            break
        bf.rows_processed_count += int(last["n"])
        snap = backfill_snapshot(page, table_name, pk_cols)
        if cdc_events is not None:
            snap = fence_merge(snap, cdc_events, fence_lsn)
        pages.append(snap)
        bf.rows_ingested_count += snap.count()
        keys.unpersist()
        bf.cursor = [last["last_cursor"][c] for c in cursor_cols]
        opt.record(opt.size, elapsed_ms)
        n_pages += 1
        if max_pages and n_pages >= max_pages:
            break
    events = pages[0] if pages else None
    for p in pages[1:]:
        events = events.unionByName(p)
    return bf, events


class PageSizeOptimizer:
    """AIMD page sizing (page_size_optimizer.ex:1-80): grow page size
    multiplicatively while queries come back under the time budget,
    back off on timeout. Driver-side only — tunes the per-page LIMIT."""

    def __init__(self, initial: int = 1000, max_timeout_ms: int = 5000, max_size: int = 50000):
        self.size = initial
        self.max_timeout_ms = max_timeout_ms
        self.max_size = max_size
        self.history: list[tuple[int, float]] = []

    def record(self, page_size: int, elapsed_ms: float) -> None:
        self.history = (self.history + [(page_size, elapsed_ms)])[-20:]
        if elapsed_ms < self.max_timeout_ms * 0.5:
            self.size = min(self.max_size, int(self.size * 1.5))
        elif elapsed_ms > self.max_timeout_ms:
            self.size = max(100, self.size // 2)
