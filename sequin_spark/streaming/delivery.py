"""Group-ordered exactly-once delivery engine (the reference's
SlotMessageStore + SinkPipeline re-expressed as a foreachBatch body).

Semantics implemented (citations into the reference):

- per-group cursor-order delivery; a failed message blocks its group's
  later messages (slot_message_store_state.ex:432-478);
- retry with exponential backoff 1s→3min and deliver_count tracking
  (slot_message_store.ex:346-357; time.ex:101);
- max_retry_count exceeded → discard table (slot_message_store.ex:1177-1190);
- idempotency ledger: delivered cursors filtered out on redelivery
  (message_ledgers.ex:65-99, sink_pipeline.ex:552-591);
- replay dedup by (commit_lsn, commit_idx) (slot_message_store_state.ex:98).

Execution model: the micro-batch is repartitioned by group hash
(partition_count ways — sink_consumer.ex:97) and sorted by (group_id,
commit_lsn, commit_idx); delivery runs executor-side in mapInPandas
(one sink client per task). Bookkeeping is ALSO executor-side: each
task appends its delivered cursors straight to the ledger directory
and its failed/blocked rows (payload included) to a per-batch failures
directory, then yields only BOUNDED summary rows — per-status counts
plus a ≤ring_size tail of acked rows per task. Nothing O(batch-rows)
ever crosses the driver: driver traffic is O(partitions + failures).

Scale note (100 TB): the ledger and pending-retry state are the only
driver-coordinated pieces — on a real cluster state_dir is shared
storage (the same contract FileLogSink already uses) and they'd be
Delta tables with MERGE, with identical semantics. Task retries /
speculative execution can double-write ledger or failure files; both
are deduplicated on read by the event identity, preserving the
at-least-once → exactly-once-effect contract.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequin_spark.sinks.base import SinkBatch, create_sink

# Bounded per-task summary rows (NOT per-event): kind='agg' rows carry
# (status, n) counts; kind='ring' rows carry the task's last ≤ring_size
# acked identities for the acknowledged-messages ring.
SUMMARY_SCHEMA = (
    "kind string, status string, n long, commit_lsn long, commit_idx long, "
    "idempotency_key string, group_id string, deliver_count int, acked_at double"
)

# Delivery-latency histogram buckets in microseconds (prometheus.ex:23-29
# sequin_delivery_latency_us). Executor tasks observe each sink call and
# ship bucket counts back as kind='lat' summary rows (bucket bound in
# commit_lsn, count in n) plus one kind='lat_agg' row per success label
# (observation count in n, summed µs in commit_lsn) — bounded rows, never
# per-event.
LAT_BUCKETS_US = (1_000, 5_000, 10_000, 25_000, 50_000, 100_000,
                  250_000, 500_000, 1_000_000, 5_000_000)
LAT_INF = 2**62  # the +Inf bucket marker

# Event identity: CDC rows are unique by (lsn, idx); backfill `read` rows
# all carry cursor (0,0) and are unique by their PK-derived idempotency
# key (table_reader.ex:405) — so dedup/ledger/status identity is the
# triple, which degrades to pure cursor identity for CDC rows.
IDENTITY = ["commit_lsn", "commit_idx", "idempotency_key"]
# createDataFrame rows above this inline into the plan as a
# LocalRelation whose string form feeds Spark's redaction regex —
# multi-MB plans overflow the Java regex stack (r11 soak).  Bigger
# driver-held frames round-trip through a state-dir parquet instead.
LOCAL_PLAN_MAX_ROWS = 1024

BACKOFF_MIN_S = 1.0
BACKOFF_MAX_S = 180.0


def backoff_s(deliver_count: int, base_s: float = BACKOFF_MIN_S) -> float:
    """Exponential backoff 1s → 3min (lib/sequin/time.ex:101)."""
    return min(base_s * (2 ** max(0, deliver_count - 1)), BACKOFF_MAX_S)


def _write_parquet(path: str, df: pd.DataFrame) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


# per-Python-worker incremental slice cache: {slice_dir: (identity set,
# file names already folded in)}.  Workers are reused across
# micro-batches, so steady-state each task reads only the files the
# PREVIOUS batch appended instead of the whole slice.  Keeping
# identities past the trim watermark in the cached set is harmless
# (trimmed identities can never recur); the set is rebuilt trim-
# filtered at each compaction so memory stays O(retention window).
_SLICE_CACHE: dict = {}


def _load_ledger_slice(sdir: str, trim_lsn: int,
                       compact_files: int) -> set:
    """Executor-side: one partition's delivered-identity set (the
    task-local anti-join build), incrementally maintained per worker,
    compacting the slice when its file count piles up.  Runs inside
    the deliver task — parallel across partitions, never a driver job.
    Tolerates concurrent compaction (missing files are skipped;
    duplicate identities are harmless set inserts)."""
    import pyarrow.compute as pc

    files = sorted(
        os.path.join(sdir, f) for f in os.listdir(sdir)
        if f.endswith(".parquet"))
    seen, folded = _SLICE_CACHE.get(sdir, (set(), set()))
    new = [f for f in files if f not in folded]
    tables = []
    for f in new:
        try:
            tables.append(pq.read_table(f))
        except (FileNotFoundError, OSError):
            continue
    if tables:
        merged = pa.concat_tables(tables)
        if trim_lsn > 0:
            lsn = merged["commit_lsn"]
            merged = merged.filter(
                pc.or_(pc.greater_equal(lsn, trim_lsn), pc.equal(lsn, 0)))
        pdf = merged.to_pandas()
        seen = seen | set(zip(pdf["commit_lsn"].tolist(),
                              pdf["commit_idx"].tolist(),
                              pdf["idempotency_key"].tolist()))
        folded = folded | set(new)
    if len(files) >= compact_files:
        # full re-read with the trim applied: compaction is also the
        # cache's memory bound (the set is rebuilt O(window))
        tables = []
        for f in files:
            try:
                tables.append(pq.read_table(f))
            except (FileNotFoundError, OSError):
                continue
        if tables:
            merged = pa.concat_tables(tables)
            if trim_lsn > 0:
                lsn = merged["commit_lsn"]
                merged = merged.filter(
                    pc.or_(pc.greater_equal(lsn, trim_lsn),
                           pc.equal(lsn, 0)))
            pdf = merged.to_pandas().drop_duplicates(subset=IDENTITY)
            tmp = os.path.join(sdir,
                               f"compact-{uuid.uuid4().hex}.parquet.tmp")
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False), tmp)
            final = tmp[: -len(".tmp")]
            os.rename(tmp, final)
            for f in files:
                try:
                    os.remove(f)
                except FileNotFoundError:
                    pass
            seen = set(zip(pdf["commit_lsn"].tolist(),
                           pdf["commit_idx"].tolist(),
                           pdf["idempotency_key"].tolist()))
            folded = {final}
    _SLICE_CACHE[sdir] = (seen, folded)
    return seen


class DeliveryEngine:
    def __init__(
        self,
        sink_type: str,
        sink_config: dict | None = None,
        state_dir: str | None = None,
        batch_size: int | None = None,
        batch_bytes: int | None = None,
        partition_count: int = 8,
        max_retry_count: int = 3,
        routing_cols: tuple[str, ...] = (),
        batch_cols: tuple[str, ...] | None = None,
        backoff_base_s: float = BACKOFF_MIN_S,
        load_shedding_policy: str = "pause_on_full",
        max_pending: int | None = None,
        acked_ring_size: int = 1000,
        ledger_compact_files: int = 64,
        ledger_trim_batches: int | None = None,
        tracer=None,
        consumer_id: str | None = None,
        low_latency: bool = False,
    ):
        if load_shedding_policy not in ("pause_on_full", "discard_on_full"):
            raise ValueError(f"unknown load_shedding_policy {load_shedding_policy!r}")
        self.sink_type = sink_type
        self.sink_config = sink_config or {}
        self.state_dir = state_dir or f"/tmp/sequin_spark_state/{uuid.uuid4().hex}"
        sink = create_sink(sink_type, self.sink_config)
        self.batch_size = batch_size or sink.default_batch_size
        # byte-bound batching (sink_pipeline.ex:413-434): one 4 MB row
        # must not ride in a 200-row batch that breaks the sink's
        # payload limit — chunks close on EITHER bound
        self.batch_bytes = batch_bytes or sink.default_batch_bytes
        self.partition_count = partition_count
        self.max_retry_count = max_retry_count
        self.routing_cols = tuple(routing_cols)
        # chunk-bounding subset of routing_cols: the reference's Broadway
        # batch_key (sink_pipeline.ex:371-430).  Per-message routing keys
        # (kafka message_key, kinesis partition_key, ...) must NOT close
        # chunks — at high group cardinality that degenerates to one-row
        # sink calls (the r11 soak's ~700 rows/s delivery ceiling).  None
        # = derive from the sink's routing schema; passing routing_cols
        # explicitly restores the old per-message behavior.
        if batch_cols is None:
            from sequin_spark.functions.routing import (
                ALWAYS_PRESENT_DELIVERY_COLS, batch_keys_for)

            derived = batch_keys_for(sink_type)
            batch_cols = tuple(
                c for c in derived
                if c in self.routing_cols or c in ALWAYS_PRESENT_DELIVERY_COLS)
        self.batch_cols = tuple(batch_cols)
        self.backoff_base_s = backoff_base_s
        self.load_shedding_policy = load_shedding_policy
        # The reference's 50k message cap is PER message-store
        # partition (slot_message_store_state.ex:18 default ×
        # :partition at :26 — a consumer holds partition_count stores),
        # so the faithful driver-frame cap scales with partition_count.
        # Explicit values are taken as the TOTAL cap (tests pin tiny
        # spill windows with max_pending=1).  At the 400k default the
        # pending frame is bounded ~10s of MB driver-side; the backlog
        # beyond it lives in the parquet overflow FIFO either way.
        self.max_pending = (max_pending if max_pending is not None
                            else 50_000 * partition_count)
        self.acked_ring_size = acked_ring_size
        self.ledger_compact_files = ledger_compact_files
        # Streaming-only ledger retention (message_ledgers.ex
        # trim_delivered_cursors: the reference trims the delivered-cursor
        # set at the verified high watermark). With checkpoint-commit=ack,
        # a restarted stream replays at most the last uncommitted
        # micro-batch, so identities delivered ≥N batches ago can never be
        # redelivered — keeping them makes the per-batch broadcast
        # anti-join side grow with stream LIFETIME (the r3 latency
        # regression: 1.35M-row ledger after 35s at 50k rows/s). None
        # disables trimming (batch-replay semantics: run_batch callers may
        # legitimately replay arbitrarily old data).
        self.ledger_trim_batches = ledger_trim_batches
        # optional streaming.trace.Tracer: batch-granular trace events
        # (trace.ex Trace.info/error at every delivery attempt)
        self.tracer = tracer
        self.consumer_id = consumer_id
        # low-latency mode (r9 verdict task #5): ledger co-partitioned
        # into per-delivery-partition slices, consulted inside the
        # deliver tasks (no per-batch broadcast anti-join JOB — the
        # measured ~550 ms p50 component); slice compaction runs inside
        # tasks; the advisory acked-ring write is async.  Write-ahead
        # ordering (ledger append before checkpoint ack) is unchanged.
        self.low_latency = low_latency
        self._slice_layout_ok = False
        self._bg = None  # lazy single-thread executor for advisory writes
        self._lsn_maxes: list[int] = []  # per-batch max delivered commit_lsn
        self._ledger_trim_lsn = 0
        os.makedirs(self.state_dir, exist_ok=True)

    # --- state tables ----------------------------------------------------
    @property
    def ledger_dir(self) -> str:
        return os.path.join(self.state_dir, "ledger")

    @property
    def pending_path(self) -> str:
        return os.path.join(self.state_dir, "pending", "pending.parquet")

    @property
    def discarded_dir(self) -> str:
        return os.path.join(self.state_dir, "discarded")

    def failures_dir(self, batch_id: int) -> str:
        """Per-batch executor-written failed/blocked rows (payload
        included) — read back by the driver, O(failures) not O(batch)."""
        return os.path.join(self.state_dir, "failures", f"batch-{batch_id}")

    def _scalable_local_df(self, spark: SparkSession, pdf: pd.DataFrame,
                           tag: str) -> DataFrame:
        """Driver-held rows → Spark DataFrame WITHOUT inlining them
        into the query plan once they're big: createDataFrame embeds
        every row in a LocalRelation, and a multi-megabyte plan string
        (tens of thousands of pending re-entries after a catch-up
        burst) blows Java's regex stack inside Spark's progress/plan
        redaction — the stream execution thread died of
        StackOverflowError in the r11 soak.  Above the threshold the
        rows round-trip through a state-dir parquet so the plan is a
        one-file scan.  Safe to reuse the per-tag path: process_batch
        fully materializes within the call."""
        if len(pdf) <= LOCAL_PLAN_MAX_ROWS:
            return spark.createDataFrame(pdf)
        path = os.path.join(self.state_dir, "reentry", f"{tag}.parquet")
        _write_parquet(path, pdf)
        return spark.read.parquet(path)

    # --- pause_on_full overflow spill (disk-backed backpressure) ---------
    @property
    def overflow_dir(self) -> str:
        return os.path.join(self.state_dir, "overflow")

    def _overflow_dirs(self) -> "list[tuple[str, int]]":
        """FIFO-ordered (path, rows) of spilled micro-batches.  Row
        counts ride in the directory name (stamped at spill time) so
        the backlog is sized without footer reads; a crash between
        write and rename leaves a name without the count suffix —
        fall back to footers for that one."""
        d = self.overflow_dir
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            p = os.path.join(d, name)
            if name.startswith("_") or not os.path.isdir(p):
                continue
            parts = name.split("_")
            try:
                rows = int(parts[2])
            except (IndexError, ValueError):
                rows = sum(
                    pq.ParquetFile(os.path.join(p, f)).metadata.num_rows
                    for f in os.listdir(p)
                    if f.endswith(".parquet"))
            out.append((p, rows))
        return out

    def _spill_overflow(self, df: DataFrame, batch_id: int) -> int:
        """Append the batch's (already ledger-anti-joined) new rows to
        the overflow spill as one parquet dir.  Batch REPLAYS (async
        progress, crash-before-checkpoint) append a second copy of the
        same identities — harmless: the ledger/adjacent dedup drops
        already-delivered copies at delivery time, exactly like source
        redelivery."""
        tmp = os.path.join(self.overflow_dir,
                           f"_{time.time_ns():020d}_{batch_id}")
        df.write.mode("overwrite").parquet(tmp)
        rows = sum(
            pq.ParquetFile(os.path.join(tmp, f)).metadata.num_rows
            for f in os.listdir(tmp) if f.endswith(".parquet"))
        final = os.path.join(
            self.overflow_dir,
            f"{time.time_ns():020d}_{batch_id}_{rows}")
        os.rename(tmp, final)
        return rows

    def _reingest_overflow(
            self, spark: SparkSession, headroom: int,
    ) -> "tuple[DataFrame | None, int, list[str]]":
        """Oldest-first re-ingest of spilled batches up to ``headroom``
        rows (whole-dir granularity; at least one dir so an oversized
        spill can never stall the drain).  The dirs are NOT deleted
        here — deletion happens at the END of process_batch, after the
        delivery pass and state writes, so a crash mid-batch replays
        them and the ledger dedup resolves the copies (the same
        crash-window contract as the failures dir)."""
        dirs = self._overflow_dirs()
        if not dirs:
            return None, 0, []
        take, nonempty, rows = [], [], 0
        for p, n in dirs:
            if n == 0:
                take.append(p)  # empty spill (idle paused batch) — reap
                continue
            if rows and rows + n > headroom:
                break
            take.append(p)
            nonempty.append(p)
            rows += n
            if rows >= headroom:
                break
        if not nonempty:
            return None, 0, take
        df = spark.read.parquet(*nonempty)
        return df, rows, take

    def _read_pending(self) -> pd.DataFrame | None:
        if os.path.exists(self.pending_path):
            return pq.read_table(self.pending_path).to_pandas()
        return None

    def read_ledger(self, spark: SparkSession) -> DataFrame | None:
        if os.path.isdir(self.ledger_dir) and any(
                not f.startswith("_") for f in os.listdir(self.ledger_dir)):
            # explicit schema: the ledger layout is fixed (IDENTITY), and
            # schema inference costs a footer-read job per micro-batch.
            # recursiveFileLookup covers both layouts: flat per-batch
            # files AND low-latency per-partition slice subdirs (whose
            # files carry an extra group_id column parquet pruning drops)
            return spark.read.schema(
                "commit_lsn long, commit_idx long, idempotency_key string"
            ).option("recursiveFileLookup", "true").parquet(self.ledger_dir)
        return None

    # --- low-latency slice layout (r9 verdict task #5) --------------------
    def _slice_dir(self, pid: int) -> str:
        return os.path.join(self.ledger_dir, f"p{pid:05d}")

    @property
    def _layout_marker(self) -> str:
        return os.path.join(self.ledger_dir, "_layout.json")

    def _ensure_slice_layout(self, spark: SparkSession) -> None:
        """Slice files are keyed by the delivery repartition's hash
        (pmod(murmur3(group_id), partition_count)); a partition_count
        change invalidates the mapping, so relayout once (one bounded
        Spark job over the trimmed window) and record the count in a
        marker.  Flat legacy files (no group_id column) cannot be
        sliced — they stay where they are and are anti-joined as a
        shrinking residue until the trim watermark passes them."""
        import json as _json

        if self._slice_layout_ok:
            return
        os.makedirs(self.ledger_dir, exist_ok=True)
        current = None
        if os.path.exists(self._layout_marker):
            with open(self._layout_marker) as f:
                current = _json.load(f).get("partition_count")
        if current is not None and current != self.partition_count:
            slice_files = []
            for d in os.listdir(self.ledger_dir):
                full = os.path.join(self.ledger_dir, d)
                if d.startswith("p") and os.path.isdir(full):
                    slice_files += [os.path.join(full, f)
                                    for f in os.listdir(full)]
            if slice_files:
                df = spark.read.schema(
                    "commit_lsn long, commit_idx long, "
                    "idempotency_key string, group_id string"
                ).parquet(*slice_files)
                # F.hash IS the repartition partitioner's Murmur3Hash
                # (seed 42); pmod matches HashPartitioning
                pdf = df.withColumn(
                    "_pid",
                    F.pmod(F.hash("group_id"),
                           F.lit(self.partition_count)).cast("int")
                ).toPandas()
                for pid, grp in pdf.groupby("_pid"):
                    d = self._slice_dir(int(pid))
                    os.makedirs(d, exist_ok=True)
                    _write_parquet(
                        os.path.join(d, f"relayout-{uuid.uuid4().hex}.parquet"),
                        grp.drop(columns=["_pid"]))
                for f in slice_files:
                    os.remove(f)
        with open(self._layout_marker, "w") as f:
            _json.dump({"partition_count": self.partition_count}, f)
        self._slice_layout_ok = True

    def _flat_ledger_residue(self, spark: SparkSession) -> DataFrame | None:
        """Top-level (pre-low-latency) ledger files: bounded residue
        anti-joined the old way until trimming retires it."""
        if not os.path.isdir(self.ledger_dir):
            return None
        files = [os.path.join(self.ledger_dir, f)
                 for f in os.listdir(self.ledger_dir)
                 if not f.startswith(("_", "p"))
                 and os.path.isfile(os.path.join(self.ledger_dir, f))]
        if not files:
            return None
        df = spark.read.schema(
            "commit_lsn long, commit_idx long, idempotency_key string"
        ).parquet(*files)
        if self._ledger_trim_lsn > 0:
            df = df.filter((F.col("commit_lsn") >= self._ledger_trim_lsn)
                           | (F.col("commit_lsn") == 0))
        return df

    def _bg_submit(self, fn, *args) -> None:
        """Advisory (non-durability-bearing) writes off the trigger
        path: single worker thread, so writes serialize in order."""
        from concurrent.futures import ThreadPoolExecutor

        if self._bg is None:
            self._bg = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="delivery-bg")
        self._bg.submit(fn, *args)

    def _ledger_for_antijoin(self, spark: SparkSession) -> DataFrame | None:
        """The ledger slice that can still match incoming rows: under
        trimming, only identities newer than the watermark (plus
        lsn==0 backfill-read identities, which carry no cursor and are
        never trimmed). The lsn predicate prunes parquet row groups, so
        the broadcast side stays O(retention window), not O(lifetime)."""
        ledger = self.read_ledger(spark)
        if ledger is None or self._ledger_trim_lsn <= 0:
            return ledger
        return ledger.filter(
            (F.col("commit_lsn") >= self._ledger_trim_lsn)
            | (F.col("commit_lsn") == 0)
        )

    @property
    def acked_ring_path(self) -> str:
        return os.path.join(self.state_dir, "acked", "ring.parquet")

    def acked_ring(self) -> pd.DataFrame | None:
        """Last-N acknowledged messages (acknowledged_messages.ex:1-30 —
        the reference keeps a 1000-entry ring per consumer for the UI)."""
        if os.path.exists(self.acked_ring_path):
            return pq.read_table(self.acked_ring_path).to_pandas()
        return None

    def _update_ring(self, ring_new: pd.DataFrame) -> None:
        prev = self.acked_ring()
        ring = (
            pd.concat([prev, ring_new], ignore_index=True)
            if prev is not None else ring_new
        ).tail(self.acked_ring_size)
        _write_parquet(self.acked_ring_path, ring)

    def flush_background(self) -> None:
        """Drain pending advisory writes (tests / orderly shutdown)."""
        if self._bg is not None:
            self._bg.shutdown(wait=True)
            self._bg = None

    def _compact_ledger(self) -> None:
        """Merge small per-batch ledger files once they pile up — keeps
        the per-batch broadcast read O(1) files instead of O(batches)."""
        if not os.path.isdir(self.ledger_dir):
            return
        files = [os.path.join(self.ledger_dir, f) for f in os.listdir(self.ledger_dir)]
        if len(files) < self.ledger_compact_files:
            return
        files = [f for f in files if os.path.isfile(f)
                 and not os.path.basename(f).startswith("_")]
        if len(files) < self.ledger_compact_files:
            return
        merged = pa.concat_tables([pq.read_table(f) for f in files])
        if self._ledger_trim_lsn > 0:
            import pyarrow.compute as pc

            lsn = merged["commit_lsn"]
            merged = merged.filter(
                pc.or_(pc.greater_equal(lsn, self._ledger_trim_lsn),
                       pc.equal(lsn, 0))
            )
        tmp = os.path.join(self.ledger_dir, f"compact-{uuid.uuid4().hex}.parquet.tmp")
        pq.write_table(merged, tmp)
        final = tmp[: -len(".tmp")]
        os.rename(tmp, final)
        for f in files:
            os.remove(f)

    # --- admin operations (slot_message_store.ex discard_all /
    # redeliver semantics) -------------------------------------------------
    def discard_all_pending(self) -> int:
        """Admin: drop the whole retry backlog (discard_all)."""
        pending = self._read_pending()
        n = 0 if pending is None else len(pending)
        if n:
            _write_parquet(
                os.path.join(self.discarded_dir, f"admin-{uuid.uuid4().hex}.parquet"),
                pending.drop(columns=["not_visible_until"]).assign(error="admin discard_all"),
            )
            os.remove(self.pending_path)
        return n

    def discard_failing_pending(self) -> int:
        """Admin: discard only the FAILING retry entries — attempted at
        least once (deliver_count > 0) and now backing off — while
        messages that merely wait their turn (deferred behind a group
        head, deliver_count == 0) stay pending
        (slot_message_store.ex discard_failing_messages;
        slot_message_store_test.exs:1084 "discards only failing
        messages").  Returns the discarded count."""
        pending = self._read_pending()
        if pending is None or not len(pending):
            return 0
        failing = pending[pending["deliver_count"] > 0]
        if not len(failing):
            return 0
        _write_parquet(
            os.path.join(self.discarded_dir,
                         f"admin-{uuid.uuid4().hex}.parquet"),
            failing.drop(columns=["not_visible_until"])
                   .assign(error="admin discard_failing"),
        )
        keep = pending[pending["deliver_count"] <= 0]
        if len(keep):
            _write_parquet(self.pending_path, keep)
        else:
            os.remove(self.pending_path)
        return int(len(failing))

    def redeliver_discarded(self) -> int:
        """Admin: move discarded (max-retry-exceeded) messages back into
        the pending set with a reset deliver_count — the manual
        redeliver escape hatch after fixing a broken sink."""
        if not (os.path.isdir(self.discarded_dir) and os.listdir(self.discarded_dir)):
            return 0
        frames = [
            pq.read_table(os.path.join(self.discarded_dir, f)).to_pandas()
            for f in os.listdir(self.discarded_dir)
        ]
        disc = pd.concat(frames, ignore_index=True).drop(columns=["error"], errors="ignore")
        disc["deliver_count"] = 0
        disc["not_visible_until"] = 0.0
        pending = self._read_pending()
        merged = pd.concat([pending, disc], ignore_index=True) if pending is not None else disc
        merged = merged.drop_duplicates(subset=IDENTITY, keep="first")
        _write_parquet(self.pending_path, merged)
        for f in os.listdir(self.discarded_dir):
            os.remove(os.path.join(self.discarded_dir, f))
        return len(disc)

    def arrange_for_delivery(self, new_rows: DataFrame) -> DataFrame:
        """Physical layout for ordered delivery: ONE group-hash
        exchange + per-partition sort; idempotency_key as the final
        sort key makes equal identities adjacent (dedup), and
        deliver_count DESC prefers the pending-retry copy (its backoff
        bookkeeping) when a retry collides with a source redelivery.
        Extracted so its plan can be fingerprinted and gated
        (tests/test_plan_quality.py::test_delivery_plan_fingerprint —
        a silent extra shuffle here would otherwise only show up as
        trigger-latency drift)."""
        arranged = new_rows.repartition(
            self.partition_count, "group_id"
        ).sortWithinPartitions(
            "group_id", "commit_lsn", "commit_idx", "idempotency_key",
            F.col("deliver_count").desc(),
        )
        if self.low_latency:
            arranged = arranged.withColumn("_pid", F.spark_partition_id())
        return arranged

    # --- the foreachBatch body -------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> dict:
        spark = batch_df.sparkSession
        now = time.time()
        delivery_cols = [
            "group_id", "commit_lsn", "commit_idx", "idempotency_key",
            "key", "value", *self.routing_cols,
        ]

        # NOTE: no dropDuplicates here — identity dedup is fused into the
        # group-hash repartition below. Duplicate identities are the same
        # event, so they share group_id and land in the same partition,
        # where the (group, lsn, idx, key) sort makes them ADJACENT; the
        # deliver task drops them with a cross-frame carry. Equivalent to
        # the identity-keyed dropDuplicates shuffle, one full exchange of
        # the event stream cheaper per micro-batch.
        new_rows = batch_df.select(
            *[F.col(c) for c in delivery_cols]
        ).withColumn("deliver_count", F.lit(0))

        # idempotency ledger anti-join (broadcast — bounded by the trim
        # watermark under streaming)
        # No dropDuplicates on the build side: left_anti only probes for
        # existence, so ledger duplicates (task-retry double-writes) are
        # harmless — deduping them cost a full shuffle per micro-batch
        # (~0.3 s fixed at 50k rows/s, the largest addBatch overhead)
        if self.low_latency:
            # r9 verdict task #5: the ledger is co-partitioned with the
            # group-hash layout and consulted INSIDE the deliver tasks
            # (each task reads only its own slice — no per-batch
            # broadcast-build job, measured at ~550 ms of trigger p50).
            # Only a flat legacy residue still anti-joins here.
            self._ensure_slice_layout(spark)
            residue = self._flat_ledger_residue(spark)

            def ledger_antijoin(df: DataFrame) -> DataFrame:
                if residue is None:
                    return df
                return df.join(F.broadcast(residue.select(*IDENTITY)),
                               IDENTITY, "left_anti")
        else:
            ledger = self._ledger_for_antijoin(spark)

            def ledger_antijoin(df: DataFrame) -> DataFrame:
                if ledger is None:
                    return df
                return df.join(F.broadcast(ledger.select(*IDENTITY)),
                               IDENTITY, "left_anti")
        new_rows = ledger_antijoin(new_rows)

        # pending retries: due ones re-enter delivery; not-due (still
        # backing off) block their whole group. Messages deferred by
        # group blocking are NOT dropped — they ride in pending with
        # unchanged deliver_count until the group head resolves.
        pending = self._read_pending()
        # first-seen times survive redelivery round-trips via this driver-side
        # snapshot (pending is bounded by max_pending) — feeds the
        # sequin_oldest_message_age_ms gauge (prometheus.ex:39-45)
        prev_seen = None
        if pending is not None and "first_seen_at" in pending.columns:
            prev_seen = pending[IDENTITY + ["first_seen_at"]].rename(
                columns={"first_seen_at": "_prev_seen"}
            ).drop_duplicates(subset=IDENTITY)
        shed = spilled = reingested = 0
        overflow_taken: list[str] = []
        overflow_backlog = 0
        if self.load_shedding_policy == "pause_on_full":
            # store full (slot_message_store_state.ex:18-48 memory cap;
            # load_shedding_policy sink_consumer.ex:100).  The reference
            # PAUSES intake (stops acking the slot; WAL absorbs the
            # backlog) — the microbatch analog is a disk-backed FIFO
            # overflow: `pending` (read into the driver every batch)
            # stays bounded by max_pending, the backlog absorbs to
            # parquet.  STRICT FIFO while the spill is non-empty: every
            # new row routes through it, because a direct path would
            # let a newer row overtake an older spilled one in the same
            # group (order violation).  Raising here instead (the pre-
            # r11 behavior) killed the stream on the first post-restart
            # catch-up burst — found by the r11 chaos-under-load soak.
            pend_n = 0 if pending is None else len(pending)
            ov = self._overflow_dirs()
            if ov or pend_n >= self.max_pending:
                if int(new_rows.count()):
                    spilled = self._spill_overflow(new_rows, batch_id)
                new_rows = new_rows.limit(0)
                headroom = self.max_pending - pend_n
                if headroom > 0:
                    re_df, reingested, overflow_taken = \
                        self._reingest_overflow(spark, headroom)
                    if re_df is not None:
                        # re-ingested rows re-run the ledger anti-join:
                        # a spill REPLAY copy (or a crash after delivery
                        # but before dir reap) must not deliver twice
                        new_rows = ledger_antijoin(
                            re_df.select(new_rows.columns))
                # taken dirs are still on disk (deleted post-delivery),
                # so the live backlog is everything minus this batch's
                # re-ingest
                overflow_backlog = (
                    sum(n for _, n in self._overflow_dirs()) - reingested)
        elif pending is not None and len(pending) >= self.max_pending:
            # discard_on_full: count-and-drop, recorded as shed
            shed_df = new_rows.count()
            shed = int(shed_df)
            new_rows = new_rows.limit(0)

        blocked_groups: set[str] = set()
        carry_pending = pd.DataFrame()
        if pending is not None and len(pending):
            due = pending[pending["not_visible_until"] <= now]
            not_due = pending[pending["not_visible_until"] > now]
            blocked_groups = set(not_due["group_id"].dropna())
            due_blocked = due[due["group_id"].isin(blocked_groups)]
            due_free = due[~due["group_id"].isin(blocked_groups)]
            carry_pending = pd.concat([not_due, due_blocked], ignore_index=True)
            if len(due_free):
                new_rows = new_rows.unionByName(
                    self._scalable_local_df(
                        spark, due_free[delivery_cols + ["deliver_count"]],
                        "due_free"))

        if blocked_groups:
            # defer (don't drop) new messages behind a backoff-blocked
            # head — flagged via a broadcast join and spilled WITH their
            # payloads by the deliver tasks (status 'deferred', same
            # failures dir as failed/blocked rows), so no event payload
            # rides through the driver
            blocked_df = self._scalable_local_df(
                spark,
                pd.DataFrame({"group_id": sorted(blocked_groups)}),
                "blocked_groups",
            ).withColumn("_deferred", F.lit(True))
            new_rows = new_rows.join(F.broadcast(blocked_df), "group_id", "left")
            new_rows = new_rows.withColumn(
                "_deferred", F.coalesce(F.col("_deferred"), F.lit(False))
            )
        else:
            new_rows = new_rows.withColumn("_deferred", F.lit(False))

        arranged = self.arrange_for_delivery(new_rows)

        sink_type, sink_config = self.sink_type, dict(self.sink_config)
        max_batch = self.batch_size
        batch_cols = list(self.batch_cols)
        max_bytes = self.batch_bytes
        ledger_dir, fail_dir = self.ledger_dir, self.failures_dir(batch_id)
        ring_size = self.acked_ring_size
        use_slices = self.low_latency
        slice_trim_lsn = self._ledger_trim_lsn
        slice_compact_files = self.ledger_compact_files

        def deliver(batches):
            """Executor task body: deliver the ordered partition AND do its
            own bookkeeping — append delivered identities to the ledger,
            spill failed/blocked rows (payload included) to the per-batch
            failures dir, and yield only bounded summary rows. Task-retry
            double-writes are resolved on read (dedup by identity)."""
            sink = create_sink(sink_type, sink_config)
            sink.open()
            vectorized = callable(getattr(sink, "deliver_frame", None))
            # where _finish appends delivered identities: the flat
            # ledger dir, or (low-latency) this task's slice dir with
            # group_id attached (set when the first frame arrives)
            ledger_target = {"dir": ledger_dir, "with_group": False}
            status_cols = ["commit_lsn", "commit_idx", "idempotency_key", "group_id",
                           "status", "error", "deliver_count"]
            # per-task latency histogram: {success: [bucket counts..., +Inf]}
            lat_counts = {"true": [0] * (len(LAT_BUCKETS_US) + 1),
                          "false": [0] * (len(LAT_BUCKETS_US) + 1)}
            lat_sum_us = {"true": 0, "false": 0}

            def _observe(success: bool, dur_us: int) -> None:
                key = "true" if success else "false"
                for i, le in enumerate(LAT_BUCKETS_US):
                    if dur_us <= le:
                        lat_counts[key][i] += 1
                        break
                else:
                    lat_counts[key][-1] += 1
                lat_sum_us[key] += dur_us

            def _finish(status_pdf: pd.DataFrame, payload_pdf: pd.DataFrame):
                """Persist one frame's outcomes executor-side; return the
                bounded summary frame to yield (None for empty frames).
                A task may see several Arrow frames — file names are
                per-frame unique."""
                if not len(status_pdf):
                    return None
                task_tag = uuid.uuid4().hex
                t_now = time.time()
                delivered = status_pdf[status_pdf["status"] == "delivered"]
                failed = status_pdf[
                    status_pdf["status"].isin(["failed", "blocked", "deferred"])
                ]
                if len(delivered):
                    cols = IDENTITY + (
                        ["group_id"] if ledger_target["with_group"] else [])
                    _write_parquet(
                        os.path.join(ledger_target["dir"],
                                     f"batch-{batch_id}-{task_tag}.parquet"),
                        delivered[cols],
                    )
                if len(failed):
                    fail_rows = failed.merge(
                        payload_pdf[delivery_cols + ["deliver_count"]].drop(
                            columns=["group_id"]
                        ),
                        on=["commit_lsn", "commit_idx", "idempotency_key", "deliver_count"],
                        how="left",
                    )
                    _write_parquet(
                        os.path.join(fail_dir, f"task-{task_tag}.parquet"),
                        fail_rows[delivery_cols + ["deliver_count", "status", "error"]],
                    )
                parts = []
                counts = status_pdf.groupby("status").size()
                parts.append(pd.DataFrame({
                    "kind": "agg", "status": counts.index, "n": counts.values,
                    "commit_lsn": 0, "commit_idx": 0, "idempotency_key": "",
                    "group_id": "", "deliver_count": 0, "acked_at": t_now,
                }))
                if len(delivered):
                    tail = delivered.tail(ring_size)
                    parts.append(pd.DataFrame({
                        "kind": "ring", "status": "delivered", "n": 1,
                        "commit_lsn": tail["commit_lsn"].values,
                        "commit_idx": tail["commit_idx"].values,
                        "idempotency_key": tail["idempotency_key"].values,
                        "group_id": tail["group_id"].values,
                        "deliver_count": tail["deliver_count"].astype("int64").values,
                        "acked_at": t_now,
                    }))
                return pd.concat(parts, ignore_index=True)

            # cross-frame dedup carry: the tail identity of the previous
            # Arrow frame (duplicates are sort-adjacent, so any dup that
            # straddles a frame boundary equals the previous tail)
            prev_tail = None
            slice_seen = None
            # cross-frame GROUP-BLOCKING carry (r11): a group whose
            # chunk failed earlier in this task must stay blocked for
            # the rest of the task — frames are an Arrow transport
            # boundary, not an ordering boundary.  Per-frame reset
            # delivered a blocked group's later rows whenever the
            # group straddled a frame (order violation; caught by the
            # chaos sweep under a 10-row maxRecordsPerBatch).
            failed_groups: set = set()
            for pdf in batches:
                if use_slices and len(pdf):
                    if slice_seen is None:
                        # task-local ledger slice: this partition's
                        # delivered identities (write-ahead state
                        # co-partitioned with the group-hash layout)
                        pid = int(pdf["_pid"].iloc[0])
                        sdir = os.path.join(ledger_dir, f"p{pid:05d}")
                        os.makedirs(sdir, exist_ok=True)
                        ledger_target["dir"] = sdir
                        ledger_target["with_group"] = True
                        slice_seen = _load_ledger_slice(
                            sdir, slice_trim_lsn, slice_compact_files)
                    if slice_seen:
                        # plain zip-membership against the python set:
                        # 0.6 µs/row vs MultiIndex.isin's 92 µs/row
                        # (the r11 soak's dominant trigger cost — 9 s
                        # per 100k-row frame at a 660k-identity slice)
                        import numpy as _np

                        hit = _np.fromiter(
                            (t in slice_seen for t in zip(
                                pdf["commit_lsn"].tolist(),
                                pdf["commit_idx"].tolist(),
                                pdf["idempotency_key"].tolist())),
                            dtype=bool, count=len(pdf))
                        pdf = pdf[~hit]
                    pdf = pdf.drop(columns=["_pid"])
                if len(pdf):
                    dup = pdf.duplicated(subset=IDENTITY, keep="first")
                    if prev_tail is not None:
                        dup |= (
                            (pdf["commit_lsn"] == prev_tail[0])
                            & (pdf["commit_idx"] == prev_tail[1])
                            & (pdf["idempotency_key"] == prev_tail[2])
                        )
                    last = pdf.iloc[-1]
                    prev_tail = (last["commit_lsn"], last["commit_idx"],
                                 last["idempotency_key"])
                    if dup.any():
                        pdf = pdf[~dup]
                # rows behind a backoff-blocked group head: never
                # attempted — spill them (payload included) straight to
                # the failures dir and strip them from the frame
                defer_mask = (
                    pdf["_deferred"].astype(bool)
                    if "_deferred" in pdf.columns
                    else pd.Series(False, index=pdf.index)
                )
                if defer_mask.any():
                    dpdf = pdf[defer_mask]
                    out = _finish(
                        pd.DataFrame({
                            "commit_lsn": dpdf["commit_lsn"],
                            "commit_idx": dpdf["commit_idx"],
                            "idempotency_key": dpdf["idempotency_key"],
                            "group_id": dpdf["group_id"],
                            "status": "deferred",
                            "error": "group blocked (backoff head)",
                            "deliver_count": dpdf["deliver_count"].astype("int64"),
                        }),
                        dpdf,
                    )
                    if out is not None:
                        yield out
                    pdf = pdf[~defer_mask]
                if "_deferred" in pdf.columns:
                    pdf = pdf.drop(columns=["_deferred"])
                if not len(pdf):
                    continue
                if vectorized:
                    # fast path: whole ordered partition frame at once
                    # (order preserved by the sort; partition-granular
                    # failure instead of group-granular).  Rows of
                    # groups that failed in an EARLIER frame of this
                    # task are blocked first (cross-frame carry).
                    blk = pd.Series(False, index=pdf.index)
                    if failed_groups:
                        blk = pdf["group_id"].isin(failed_groups)
                    dpdf = pdf[~blk]
                    st, err = "delivered", ""
                    if len(dpdf):
                        t0 = time.perf_counter()
                        try:
                            sink.deliver_frame(dpdf)
                        except Exception as e:  # noqa: BLE001
                            st, err = "failed", str(e)[:500]
                            failed_groups.update(
                                g for g in dpdf["group_id"].dropna())
                        _observe(st == "delivered",
                                 int((time.perf_counter() - t0) * 1e6))
                    status_pdf = pd.DataFrame({
                        "commit_lsn": pdf["commit_lsn"],
                        "commit_idx": pdf["commit_idx"],
                        "idempotency_key": pdf["idempotency_key"],
                        "group_id": pdf["group_id"],
                        "status": [
                            "blocked" if b else st for b in blk],
                        "error": [
                            "group blocked" if b else err for b in blk],
                        "deliver_count": pdf["deliver_count"].astype("int64"),
                    })
                    out = _finish(status_pdf, pdf)
                    if out is not None:
                        yield out
                    continue
                statuses = []
                # Rows arrive sorted (group_id, lsn, idx). Batches span
                # groups but never split the per-group order, keyed by the
                # BATCH-key tuple — the reference's Broadway batch_key
                # semantics (sink_pipeline.ex:371-430): one sink call per
                # (batch_key, ≤batch_size) run, and a failure nacks the
                # whole batch + blocks the affected groups' later rows.
                # Per-message routing keys (kafka message_key, kinesis
                # partition_key, ...) ride in the rows and do NOT close
                # chunks — closing on them meant one-row sink calls at
                # high group cardinality (r11 soak, ~700 rows/s ceiling).
                rows = pdf.to_dict("records")

                def _gkey(r):
                    g = r["group_id"]
                    return None if (g is None or (isinstance(g, float) and pd.isna(g))) else g

                def flush(chunk):
                    if not chunk:
                        return
                    # batch-level routing only: chunks are homogeneous in
                    # batch_cols (they close on change), so chunk[0] is
                    # safe for these.  Per-MESSAGE keys (kafka
                    # message_key, nats subject, rabbitmq routing_key)
                    # now mix within a chunk and must NOT be smeared
                    # from chunk[0] — sinks read them row-first and
                    # fall back to their config default, never to
                    # another row's value.
                    routing = {c: chunk[0].get(c) for c in batch_cols}
                    t0 = time.perf_counter()
                    try:
                        sink.deliver(SinkBatch(routing=routing, rows=chunk))
                        _observe(True, int((time.perf_counter() - t0) * 1e6))
                        for r in chunk:
                            statuses.append(
                                (r["commit_lsn"], r["commit_idx"], r["idempotency_key"],
                                 _gkey(r), "delivered", "", int(r["deliver_count"]))
                            )
                    except Exception as e:  # noqa: BLE001
                        _observe(False, int((time.perf_counter() - t0) * 1e6))
                        err = str(e)[:500]
                        for r in chunk:
                            statuses.append(
                                (r["commit_lsn"], r["commit_idx"], r["idempotency_key"],
                                 _gkey(r), "failed", err, int(r["deliver_count"]))
                            )
                            gk = _gkey(r)
                            if gk is not None:
                                failed_groups.add(gk)

                chunk: list = []
                chunk_routing = None
                chunk_bytes = 0
                for r in rows:
                    routing = tuple(r.get(c) for c in batch_cols)
                    # encoded bytes, not characters — a mostly-CJK payload
                    # is up to 4x its len() and would blow a sink's wire
                    # cap (e.g. pub/sub 10MB) if counted in characters
                    r_bytes = len((r.get("value") or "").encode("utf-8"))
                    # close the chunk on routing change, count bound, OR
                    # byte bound (sink_pipeline.ex:413-434: emit the
                    # accumulated batch, start fresh with this row)
                    if chunk and (
                        routing != chunk_routing
                        or len(chunk) >= max_batch
                        or (max_bytes is not None and chunk_bytes + r_bytes > max_bytes)
                    ):
                        flush(chunk)
                        chunk = []
                        chunk_bytes = 0
                    # check AFTER flushing — the group's head may have just
                    # failed in the chunk ahead of this row
                    gk = _gkey(r)
                    if gk is not None and gk in failed_groups:
                        statuses.append(
                            (r["commit_lsn"], r["commit_idx"], r["idempotency_key"],
                             gk, "blocked", "group blocked", int(r["deliver_count"]))
                        )
                        continue
                    chunk_routing = routing
                    chunk.append(r)
                    chunk_bytes += r_bytes
                flush(chunk)
                out = _finish(pd.DataFrame(statuses, columns=status_cols), pdf)
                if out is not None:
                    yield out
            lat_rows = []
            for success in ("true", "false"):
                counts = lat_counts[success]
                if not any(counts):
                    continue
                for le, c in zip((*LAT_BUCKETS_US, LAT_INF), counts):
                    if c:
                        lat_rows.append(("lat", success, c, le))
                lat_rows.append(("lat_agg", success, sum(counts), lat_sum_us[success]))
            if lat_rows:
                yield pd.DataFrame({
                    "kind": [r[0] for r in lat_rows],
                    "status": [r[1] for r in lat_rows],
                    "n": [r[2] for r in lat_rows],
                    "commit_lsn": [r[3] for r in lat_rows],
                    "commit_idx": 0, "idempotency_key": "", "group_id": "",
                    "deliver_count": 0, "acked_at": 0.0,
                })
            sink.close()

        summary_pdf = arranged.mapInPandas(deliver, SUMMARY_SCHEMA).toPandas()
        agg = summary_pdf[summary_pdf["kind"] == "agg"]
        by_status = agg.groupby("status")["n"].sum() if len(agg) else pd.Series(dtype="int64")

        # fold per-task latency histograms (bounded: ≤ tasks × buckets rows)
        latency: dict[str, dict] = {}
        lat = summary_pdf[summary_pdf["kind"] == "lat"]
        for (success, le), n in lat.groupby(["status", "commit_lsn"])["n"].sum().items():
            h = latency.setdefault(success, {"buckets": {}, "sum_us": 0, "count": 0})
            h["buckets"][int(le)] = h["buckets"].get(int(le), 0) + int(n)
        lat_agg = summary_pdf[summary_pdf["kind"] == "lat_agg"]
        for success, grp in lat_agg.groupby("status"):
            h = latency.setdefault(success, {"buckets": {}, "sum_us": 0, "count": 0})
            h["count"] += int(grp["n"].sum())
            h["sum_us"] += int(grp["commit_lsn"].sum())
        n_delivered = int(by_status.get("delivered", 0))
        n_failed = int(by_status.get("failed", 0))
        n_blocked = int(by_status.get("blocked", 0))
        n_deferred = int(by_status.get("deferred", 0))

        # acknowledged-messages ring: per-task tails (≤ partitions×ring
        # rows through the driver), merged + trimmed to acked_ring_size
        if n_delivered:
            if self.ledger_trim_batches is not None:
                # advance the trim watermark: each task's ring tail holds
                # its partition's max delivered lsn, so the ring max is
                # the batch max. The watermark is the max from
                # ledger_trim_batches batches ago — anything older is
                # outside the replay window.
                ring_lsns = summary_pdf.loc[
                    summary_pdf["kind"] == "ring", "commit_lsn"
                ]
                batch_max = int(ring_lsns.max()) if len(ring_lsns) else 0
                if batch_max > 0:
                    self._lsn_maxes.append(batch_max)
                if len(self._lsn_maxes) > self.ledger_trim_batches:
                    self._lsn_maxes = self._lsn_maxes[-self.ledger_trim_batches:]
                    self._ledger_trim_lsn = self._lsn_maxes[0]
            if not self.low_latency:
                self._compact_ledger()  # slices self-compact in-task
            ring_new = summary_pdf[summary_pdf["kind"] == "ring"].sort_values(
                ["acked_at", "commit_lsn", "commit_idx", "idempotency_key"]
            )[IDENTITY + ["group_id", "deliver_count", "acked_at"]]
            if self.low_latency:
                # the ring is advisory UI state (last-N acked) — its
                # write rides a background thread off the trigger path;
                # a crash loses at most the last ring refresh, never a
                # durability-bearing row
                self._bg_submit(self._update_ring, ring_new)
            else:
                self._update_ring(ring_new)

        # new pending: executor-spilled failed/blocked rows (payloads
        # already attached). Failed rows get bumped deliver_count +
        # backoff; blocked rows keep their count (never attempted).
        new_pending = pd.DataFrame()
        discarded = pd.DataFrame()
        if os.path.isdir(fail_dir) and os.listdir(fail_dir):
            merged = pd.concat(
                [pq.read_table(os.path.join(fail_dir, f)).to_pandas()
                 for f in os.listdir(fail_dir)],
                ignore_index=True,
            ).drop_duplicates(subset=IDENTITY, keep="first")  # task-retry double-writes
            bump = merged["status"] == "failed"
            merged.loc[bump, "deliver_count"] = merged.loc[bump, "deliver_count"] + 1
            merged["not_visible_until"] = [
                now + backoff_s(dc, self.backoff_base_s) if st == "failed" else now
                for dc, st in zip(merged["deliver_count"], merged["status"])
            ]
            over = merged["deliver_count"] > self.max_retry_count
            discarded = merged[over]
            new_pending = merged[~over][delivery_cols + ["deliver_count", "not_visible_until"]]
            for f in os.listdir(fail_dir):
                os.remove(os.path.join(fail_dir, f))
            os.rmdir(fail_dir)

        # carry forward backing-off heads + group-deferred rows
        if len(carry_pending):
            new_pending = pd.concat([new_pending, carry_pending], ignore_index=True)

        oldest_pending_age_ms = 0.0
        if len(new_pending):
            # stamp/restore first_seen_at: restored from the pre-batch
            # snapshot for rows that were already pending (incl. redelivery
            # round-trips, which drop the column on the Spark leg), stamped
            # `now` for rows failing for the first time
            if "first_seen_at" in new_pending.columns:
                new_pending = new_pending.drop(columns=["first_seen_at"])
            if prev_seen is not None:
                new_pending = new_pending.merge(prev_seen, on=IDENTITY, how="left")
                new_pending["first_seen_at"] = new_pending.pop("_prev_seen").fillna(now)
            else:
                new_pending["first_seen_at"] = now
            oldest_pending_age_ms = max(
                0.0, (time.time() - float(new_pending["first_seen_at"].min())) * 1000.0
            )
            _write_parquet(self.pending_path, new_pending)
        elif os.path.exists(self.pending_path):
            os.remove(self.pending_path)

        if len(discarded):
            _write_parquet(
                os.path.join(self.discarded_dir, f"batch-{batch_id}-{uuid.uuid4().hex}.parquet"),
                discarded[delivery_cols + ["deliver_count"]].assign(error=discarded["error"].values),
            )

        # trace events (trace.ex: Trace.info/error per delivery attempt;
        # batch-granular here — the summary the console aggregates)
        if self.tracer is not None:
            cid = self.consumer_id
            if n_delivered:
                self.tracer.info(
                    cid, f"Messages delivered to {self.sink_type} sink",
                    extra={"batch_id": batch_id, "delivered": n_delivered})
            if n_failed:
                first_err = None
                fails = locals().get("merged")
                if fails is not None and "error" in fails.columns:
                    errs = fails.loc[fails["status"] == "failed", "error"]
                    first_err = str(errs.iloc[0]) if len(errs) else None
                self.tracer.error(
                    cid,
                    f"Failed to deliver messages to {self.sink_type} sink",
                    error=first_err,
                    extra={"batch_id": batch_id, "failed": n_failed,
                           "blocked": n_blocked})
            if len(discarded):
                self.tracer.warning(
                    cid, "Messages discarded after max retries",
                    extra={"batch_id": batch_id,
                           "discarded": int(len(discarded))})

        # overflow dirs whose rows just rode through the delivery pass:
        # safe to drop only now (post-delivery, post-state-writes) — a
        # crash any earlier replays them and the ledger dedup resolves
        # the copies
        for p in overflow_taken:
            shutil.rmtree(p, ignore_errors=True)

        return {
            "batch_id": batch_id,
            "delivered": n_delivered,
            "failed": n_failed,
            "blocked": n_blocked,
            "deferred": n_deferred,
            "discarded": int(len(discarded)),
            "pending": int(len(new_pending)),
            "shed": shed,
            "spilled": spilled,
            "reingested": reingested,
            "overflow_backlog": overflow_backlog,
            "oldest_pending_age_ms": oldest_pending_age_ms,
            "delivery_latency_us": latency,
        }
