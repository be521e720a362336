"""Corpus curation at scale: budgeted sampling and sequence packing.

The two operations every LLM pretraining pipeline runs after
filter/dedup (no reference analog — beyond-reference training-data
surface, like datapipe/dedup.py):

- ``sample_to_budget``: draw a deterministic per-stratum sample hitting
  a token budget with mixing weights ("50% en, 12.5% each of de/es/fr/
  zh of a 2B-token budget"). Selection is a pure hash predicate —
  ``h(doc) < rate`` — so it's a single scan with a broadcast of
  per-stratum rates: reproducible, rerunnable, no RNG state, no sort.
- ``pack_sequences``: concat-and-chunk packing (GPT-style) — documents
  are laid out into a token stream and sliced into fixed-length
  training sequences. Global packing is a serial scan; the scale form
  packs WITHIN hash buckets (bucket = doc_id % n), which is how real
  pipelines shard packing across workers: one shuffle on the bucket
  key, a running-sum window per bucket, never a global sort.

All arithmetic is md5/integer-based so a SQL oracle reproduces results
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import normalized

# 16-bit hash from the first 4 md5 hex chars — uniform on [0, 65536)
_HASH_SPAN = 65536


def _range_prepared(df: DataFrame, order_cols, npartitions=None):
    """Range-repartition df on order_cols and annotate the (ordered)
    partition id.  RangePartitioner guarantees every key in partition
    i sorts <= every key in partition i+1, so partition id order IS
    key order — the precondition both two-pass global operators rely
    on.  Persisted so the bounded per-partition stats job and the main
    job see one consistent partitioning without recomputing upstream."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    p = int(npartitions
            or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (df.repartitionByRange(p, *[F.col(c) for c in order_cols])
            .withColumn("_pid", F.spark_partition_id())
            .persist(StorageLevel.MEMORY_AND_DISK))


def global_row_number(df: DataFrame, order_cols,
                      out_col: str = "position",
                      npartitions: int | None = None) -> DataFrame:
    """Scale-safe global row_number over a TOTAL order (include a
    unique tiebreak column) — the range-partitioned two-pass
    zipWithIndex: (1) repartitionByRange on the order keys, (2)
    per-partition counts (a bounded <=P-row driver collect) folded
    into cumulative offsets broadcast as a literal map, (3)
    within-partition row_number + offset.  Replaces the single-task
    ``row_number().over(Window.orderBy(...))`` funnel that serializes
    the whole table through ONE executor at 100 TB: here every
    partition numbers its own slice in parallel and only P count rows
    ever reach the driver."""
    d = _range_prepared(df, order_cols, npartitions)
    counts = dict(d.groupBy("_pid")
                  .agg(F.count(F.lit(1)).alias("c")).collect())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(*[F.lit(v) for pid in sorted(offsets)
                          for v in (pid, offsets[pid])])
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (d.withColumn(
        out_col,
        (F.row_number().over(w)
         + F.element_at(omap, F.col("_pid"))).cast("long"))
        .drop("_pid"))


def prefix_max_exclusive(df: DataFrame, order_col: str, value_col: str,
                         out_col: str,
                         npartitions: int | None = None) -> DataFrame:
    """Scale-safe running max of value_col over all STRICTLY PRIOR
    rows in order_col order (the watermark recurrence):
    range-partition by order_col, take per-partition maxes (a bounded
    <=P-row collect), broadcast the EXCLUSIVE running max across
    partition boundaries as a literal map, and combine it with the
    within-partition exclusive prefix max.  Replaces the unpartitioned
    ``Window.orderBy(...).rowsBetween(unboundedPreceding, -1)``
    single-task funnel.  out_col is NULL for the globally first row
    (no prior data), matching the window form."""
    d = _range_prepared(df, [order_col], npartitions)
    parts = dict(d.groupBy("_pid")
                 .agg(F.max(value_col).alias("m")).collect())
    run, acc = {}, None
    for pid in sorted(parts):
        if acc is not None:
            run[pid] = acc
        m = parts[pid]
        if m is not None:
            acc = m if acc is None else max(acc, m)
    w = (Window.partitionBy("_pid").orderBy(order_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    within = F.max(value_col).over(w)
    if run:
        rmap = F.create_map(*[F.lit(v) for pid in sorted(run)
                              for v in (pid, run[pid])])
        # greatest() skips NULLs: first-in-partition rows take the
        # boundary max, partition 0 takes its within-partition max,
        # and the globally first row stays NULL
        combined = F.greatest(within, F.element_at(rmap, F.col("_pid")))
    else:
        combined = within
    return d.withColumn(out_col, combined).drop("_pid")


def _h16(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10).cast("long")


def sample_to_budget(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic stratified sample targeting ``budget_tokens``
    split by ``weights`` across strata. Keep rule:
    ``h16(id) < floor(min(1, target/total) * 65536)`` — the per-stratum
    totals are one aggregation (tiny result, broadcast back), then
    selection is a narrow scan. Docs in strata without a weight drop.
    Returns the sampled rows + their token counts and the stratum rate.
    """
    toks = F.size(F.split(normalized(text_col), " "))
    base = df.select(F.col(id_col), F.col(stratum_col).alias("stratum"), toks.alias("n_tokens"))
    totals = base.groupBy("stratum").agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    frac = wmap[F.col("stratum")] * budget_tokens / F.col("total_tokens")
    # NB: least() SKIPS nulls — guard explicitly so an unweighted
    # stratum stays null (and drops) instead of sampling at rate 1.0
    rated = totals.withColumn(
        "rate_scaled",
        F.floor(
            F.when(frac.isNotNull(), F.least(F.lit(1.0), frac)) * _HASH_SPAN
        ).cast("long"),
    ).filter(F.col("rate_scaled").isNotNull())
    return (
        base.join(F.broadcast(rated), "stratum")
        .filter(_h16(F.col(id_col)) < F.col("rate_scaled"))
        .select(id_col, "stratum", "n_tokens", "rate_scaled")
    )


def temperature_mix(
    df: DataFrame,
    budget_docs: int = 2000,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-smoothed multinomial mixing (the mT5/XLM-R α-sampling
    rule): stratum i's target share ∝ p_i^α where p_i = n_i/N, flattening
    the head so low-resource strata are over-represented relative to
    their natural frequency. α is fixed at 0.5 — i.e. sqrt(p) — because
    IEEE sqrt is correctly rounded in every engine, keeping the keep/drop
    hash boundary bit-identical between Spark and the SQL oracle
    (pow(x, α) for arbitrary α is libm-dependent in the last ulp, which
    can flip a doc across ``floor(rate·65536)``).

    Doc selection is the same deterministic ``h16(id) < floor(p·65536)``
    scan as sample_to_budget: per-stratum counts are one tiny
    aggregation broadcast back, then a narrow filter — no RNG, no sort,
    rerunnable at any scale. Returns per-stratum rows: natural count,
    smoothed target share, keep probability, and the sampled count.
    """
    import math

    base = df.select(F.col(id_col), F.col(stratum_col).alias("stratum"))
    # The per-stratum rate table is k rows (k = #languages/domains) — a
    # bounded aggregate computed driver-side, the same class of collect
    # as k-means centroids. Doing the share arithmetic in chained
    # DataFrame steps instead costs a shuffle + NLJ per tiny stage
    # (measured: 30 shuffles / 12 NLJs for what is k rows of math).
    # NULL-safe sort key: a NULL stratum (kept by groupBy, like SQL's
    # NULL group) would make sorted() compare None with str and crash
    counts = sorted(
        (
            (r["stratum"], int(r["n_docs"]))
            for r in base.groupBy("stratum")
            .agg(F.count("*").cast("long").alias("n_docs"))
            .collect()
        ),
        key=lambda sn: (sn[0] is None, sn[0] or ""),
    )
    n_total = float(sum(n for _s, n in counts))
    # Σshare is a SORTED left-fold with 0.0 init — floating addition
    # isn't associative, so an arbitrary-order SUM could differ from the
    # oracle's in the last ulp and flip a doc across the floor(p·65536)
    # keep boundary. Python doubles, JVM doubles and the SQL oracle all
    # follow IEEE-754 (sqrt correctly rounded), so the sorted fold is
    # bit-identical across all three.
    shares = {s: math.sqrt(n / n_total) for s, n in counts}
    share_total = 0.0
    for x in sorted(shares.values()):
        share_total += x
    rows = []
    for s, n in counts:
        target_share = shares[s] / share_total
        keep_p = min(1.0, target_share * budget_docs / n)
        rows.append((s, n, target_share, keep_p,
                     int(math.floor(keep_p * _HASH_SPAN))))
    spark = df.sparkSession
    rated = spark.createDataFrame(
        rows,
        "stratum string, n_docs long, target_share double, keep_p double, "
        "rate_scaled long",
    )
    sampled = (
        base.join(F.broadcast(rated.select("stratum", "rate_scaled")), "stratum")
        .filter(_h16(F.col(id_col)) < F.col("rate_scaled"))
        .groupBy("stratum")
        .agg(F.count("*").cast("long").alias("n_sampled"))
    )
    return (
        rated.join(sampled, "stratum", "left")
        .select(
            "stratum",
            "n_docs",
            # rounding stays in Spark: F.round is HALF_UP like the
            # oracle's round(); Python's round() is HALF_EVEN
            F.round("target_share", 4).alias("target_share"),
            F.round("keep_p", 4).alias("keep_p"),
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing within hash buckets: each doc gets its
    byte... token offset in its bucket's stream; training sequence id =
    offset div seq_len (a doc may straddle two sequences — standard
    GPT-style packing; document-boundary-respecting packing is the
    ``offset`` output consumed with an attention mask).

    One shuffle (by bucket), one running-sum window per bucket ordered
    by doc id. At 100 TB: buckets ≫ executors give even packing
    parallelism; no global ordering exists or is needed.
    """
    toks = F.size(F.split(normalized(text_col), " "))
    base = df.select(
        F.col(id_col),
        (F.col(id_col) % n_buckets).alias("bucket"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long").alias("offset"),
    ).withColumn("seq_id", (F.col("offset") / seq_len).cast("long"))


def unimax_allocation(
    df: DataFrame,
    budget_docs: int,
    max_epochs: int = 4,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023, arXiv:2304.09151):
    spread a total budget as uniformly as possible across strata, but
    never take more than ``max_epochs`` passes over any stratum's data —
    the principled alternative to temperature mixing for low-resource
    tails (no stratum is oversampled into memorization).

    Waterfilling in closed form over the capacity-ascending order: with
    strata sorted by capacity c_i = n_i·max_epochs, the capped set is a
    prefix, so alloc_i = min(c_i, (B − Σ_{j<i} alloc_j) / #remaining)
    needs only prefix sums — exact integer arithmetic until the final
    division, identical in any IEEE engine (no iterated float folds).

    The k-row allocation table is computed driver-side (bounded
    aggregate, as temperature_mix) and returned as
    (stratum, n_docs, capacity, alloc, epochs, capped), alloc/epochs
    rounded to 4 decimals.
    """
    # capacity-ascending order; NULL-safe stratum tie-break (a NULL
    # stratum in a capacity tie would crash None-vs-str comparison)
    counts = sorted(
        ((int(r["n_docs"]) * max_epochs, r["stratum"], int(r["n_docs"]))
         for r in df.select(F.col(id_col), F.col(stratum_col).alias("stratum"))
         .groupBy("stratum")
         .agg(F.count("*").cast("long").alias("n_docs"))
         .collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or ""),
    )
    k = len(counts)
    rows = []
    prefix = 0  # Σ capacities of capped (smaller) strata — exact int
    frozen_share = None
    for j, (cap, stratum, n) in enumerate(counts, start=1):
        if frozen_share is None:
            # capping test in INTEGER form (cap·remaining ≤ B − prefix),
            # not cap ≤ (B−prefix)/remaining: the float quotient can
            # round up onto cap exactly at a boundary and flip the
            # decision vs an engine testing the exact integers
            if cap * (k - j + 1) <= budget_docs - prefix:
                prefix += cap
                rows.append((stratum, n, cap, float(cap), cap / n, True))
                continue
            share = (budget_docs - prefix) / (k - j + 1)
            # first stratum whose capacity exceeds its fair share: every
            # larger one does too (ascending order), and redistribution
            # stops — THIS share is final for all remaining strata
            frozen_share = share
        rows.append((stratum, n, cap, frozen_share, frozen_share / n, False))
    spark = df.sparkSession
    out = spark.createDataFrame(
        rows,
        "stratum string, n_docs long, capacity long, alloc double, "
        "epochs double, capped boolean",
    )
    return out.select(
        "stratum", "n_docs", "capacity",
        F.round("alloc", 4).alias("alloc"),
        F.round("epochs", 4).alias("epochs"),
        "capped",
    )


def span_corruption(
    df: DataFrame,
    rate_pct: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """T5-style span-corruption mask generation: deterministically
    select ~``rate_pct``% of token positions via a keyed hash, then
    coalesce consecutive selected positions into spans and assign
    sentinel ids in document order — the seq2seq denoising-objective
    data-prep step (Raffel et al. 2020), reproducible across epochs
    and engines because the mask is a pure function of
    (doc, position), not RNG state.

    Plan: one posexplode scan → hash flag (narrow) → the classic
    gaps-and-islands (pos − row_number over selected positions per
    doc) → span rollup — all three windows/aggregates share the
    doc-keyed partitioning, so this is ONE shuffle keyed by doc plus
    map-side combines.

    Emits (doc, mask_id, span_start, span_len): mask_id is the 0-based
    sentinel index (<extra_id_0>, <extra_id_1>, ... in encoder order).
    """
    from pyspark.sql import Window

    from sequin_spark.datapipe.dedup import normalized
    from sequin_spark.datapipe.sketch import h60

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalized(text_col), " ")).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    flagged = toks.filter(
        (h60(F.concat_ws("|", F.col(id_col), F.col("pos"), F.lit("sc1")))
         % 100) < rate_pct)
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    spans = (
        flagged.withColumn("_rn", F.row_number().over(w_doc))
        .withColumn("_grp", F.col("pos") - F.col("_rn"))
        .groupBy(id_col, "_grp")
        .agg(F.min("pos").cast("long").alias("span_start"),
             F.count(F.lit(1)).cast("long").alias("span_len"))
    )
    w_sent = Window.partitionBy(id_col).orderBy("span_start")
    return spans.select(
        F.col(id_col),
        (F.row_number().over(w_sent) - 1).cast("int").alias("mask_id"),
        "span_start",
        "span_len",
    )
