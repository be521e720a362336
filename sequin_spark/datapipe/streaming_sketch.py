"""Streaming twins of the bounded-memory sketches (datapipe/sketch.py)
— the sketches merged IN ANGER across micro-batches, not just mergeable
by design.

The batch sketches fold a corpus to small integer register tables (HLL:
256 × max-ρ, count-min: 4×1024 × sums, KMV: k smallest distinct
hashes).  All three folds are associative+commutative, which is exactly
what Structured Streaming's state store needs to maintain them
incrementally:

* **HLL / count-min** reuse the batch fold functions UNCHANGED
  (``hll_registers`` / ``cm_counters`` are plain groupBy-aggs of max /
  sum) — on a streaming DataFrame the state store performs the
  cross-micro-batch register merge natively, partitioned by register
  key, under whichever provider is configured (heap or RocksDB).  Zero
  twin-specific code ⇒ zero twin-divergence surface; the equivalence
  tests pin it anyway.  Read out in ``complete`` mode: the result is
  register-bounded (256 / 4096 rows), the case complete mode exists
  for.
* **KMV** needs a per-key k-smallest-SET, which is not a built-in
  streaming aggregate — it uses ``applyInPandasWithState`` with the
  hash-salt as the state key: state per salt is the sorted array of the
  ≤k smallest distinct hashes in that salt (every hash maps to exactly
  one salt, so cross-salt duplicates cannot exist).  The global k
  smallest distinct hashes are a subset of the union of per-salt k-min
  sets, so ``streaming_kmv_finalize`` (which reuses the batch
  ``kmv_from_hashes`` arithmetic) is EXACTLY the batch estimate — not
  an approximation of an approximation.

Scale shape: state is O(registers) / O(salts·k) longs total —
independent of stream length — and partitioned by register/salt key, so
1000 executors each hold a slice; per-batch work is the same one-pass
fold as batch.  Reference parity: the reference keeps no sketches (its
observability counters are exact Prometheus counters); these exist for
the 100 TB corpus-profiling surface (SURVEY §6 datapipe extension).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sequin_spark.datapipe.sketch import (
    cm_counters,
    h60,
    hll_registers,
    kmv_from_hashes,
)

KMV_SALTS = 16  # state-partitioning constant: hash → salt = h % KMV_SALTS


def streaming_hll_registers(events: DataFrame, col: str) -> DataFrame:
    """HLL register table over a stream — the batch fold verbatim; the
    state store maintains per-register max across micro-batches.  Run
    with ``outputMode("complete")`` (≤256 rows by construction)."""
    return hll_registers(events, col)


def streaming_cm_counters(events: DataFrame, col: str,
                          weight: str | None = None) -> DataFrame:
    """Count-min counter table over a stream — the batch fold verbatim;
    the state store maintains per-(row,bucket) sums across
    micro-batches.  Run with ``outputMode("complete")`` (≤4096 rows)."""
    return cm_counters(events, col, weight)


def _kmv_fn(k: int):
    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            mins, n_updates = list(state.get[0]), int(state.get[1])
        else:
            mins, n_updates = [], 0
        have = set(mins)
        for pdf in pdfs:
            for h in pdf["h"]:
                h = int(h)
                if h not in have:
                    have.add(h)
                    mins.append(h)
        mins.sort()
        if len(mins) > k:
            mins = mins[:k]
        # monotone per-invocation counter — "latest emission" selector.
        # len(mins) is NOT usable for that: it saturates at k while the
        # set keeps improving (smaller hashes displacing larger), so a
        # stale emission could tie with the newest one.
        n_updates += 1
        state.update((mins, n_updates))
        yield pd.DataFrame({
            "salt": [int(key[0])],
            "n_updates": [n_updates],
            "min_hashes": [mins],
        })
    return fn


def streaming_kmv_state(events: DataFrame, col: str,
                        k: int = 256) -> DataFrame:
    """Per-salt k-minimum-hash state over a stream
    (applyInPandasWithState): emits one (salt, n_updates, min_hashes)
    row per salt per micro-batch that touches it — ``n_updates`` is a
    strictly-increasing per-salt invocation counter, so "latest state"
    = max-``n_updates`` row per salt (a set-size counter would
    saturate at k and let stale emissions tie).

    State per salt is ≤k int64s; per-batch Python work is set-insert on
    the batch's hashes only (the heavy hash fold stays in Catalyst via
    ``h60``)."""
    hashed = events.select(h60(F.col(col)).alias("h")).select(
        (F.col("h") % KMV_SALTS).cast("int").alias("salt"), "h")
    return (
        hashed.groupBy("salt")
        .applyInPandasWithState(
            _kmv_fn(k),
            outputStructType=("salt int, n_updates long, "
                              "min_hashes array<long>"),
            stateStructType="min_hashes array<long>, n_updates long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_kmv_finalize(latest_states: DataFrame,
                           k: int = 256) -> DataFrame:
    """Global KMV estimate from the latest per-salt state rows — the
    batch ``kmv_from_hashes`` arithmetic over the exploded union of
    per-salt k-min sets (a superset of the global k smallest distinct
    hashes, so the result is bit-identical to the batch sketch)."""
    hashes = latest_states.select(
        F.explode("min_hashes").alias("h")).distinct()
    return kmv_from_hashes(hashes, k)


def _reservoir_fn(k: int):
    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, keys, n_updates = (list(state.get[0]), list(state.get[1]),
                                   int(state.get[2]))
        else:
            hs, keys, n_updates = [], [], 0
        pairs = dict(zip(hs, keys))
        for pdf in pdfs:
            for h, v in zip(pdf["h"], pdf["v"]):
                pairs.setdefault(int(h), str(v))
        mins = sorted(pairs)[:k]
        n_updates += 1  # monotone latest-emission selector (see _kmv_fn)
        state.update((mins, [pairs[h] for h in mins], n_updates))
        yield pd.DataFrame({
            "salt": [int(key[0])],
            "n_updates": [n_updates],
            "min_hashes": [mins],
            "min_keys": [[pairs[h] for h in mins]],
        })
    return fn


def streaming_reservoir_state(events: DataFrame, col: str,
                              k: int = 256) -> DataFrame:
    """Streaming twin of datapipe/sampling.reservoir_sample: because
    the batch sampler is a hash ORDER STATISTIC (the k smallest
    ``h60(key)`` ARE the uniform k-sample), the streaming form is the
    same per-salt k-min state as the KMV twin, additionally carrying
    each retained hash's KEY VALUE.  The finalized sample over any
    prefix of the stream is IDENTICAL to the batch sample of that
    prefix — no RNG, no Algorithm-R bookkeeping, restart-safe via the
    state store."""
    hashed = events.select(
        h60(F.col(col)).alias("h"),
        F.col(col).cast("string").alias("v"),
    ).select((F.col("h") % KMV_SALTS).cast("int").alias("salt"), "h", "v")
    return (
        hashed.groupBy("salt")
        .applyInPandasWithState(
            _reservoir_fn(k),
            outputStructType=("salt int, n_updates long, "
                              "min_hashes array<long>, "
                              "min_keys array<string>"),
            stateStructType=("min_hashes array<long>, "
                             "min_keys array<string>, n_updates long"),
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_reservoir_finalize(latest_states: DataFrame,
                                 k: int = 256) -> DataFrame:
    """The global k-sample from the latest per-salt states: k smallest
    hashes across salts, returning their key values — exactly the
    batch ``reservoir_sample`` membership."""
    pairs = latest_states.select(
        F.explode(F.arrays_zip("min_hashes", "min_keys")).alias("p")
    ).select(F.col("p.min_hashes").alias("h"),
             F.col("p.min_keys").alias("v")).distinct()
    return pairs.orderBy("h").limit(k).select("v")
