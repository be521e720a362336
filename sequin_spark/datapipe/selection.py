"""Data-selection operators for training-corpus construction: relevance
ranking (BM25), importance resampling (DSIR), cross-document exact
substring detection, and leakage-checked dataset splits.

All pure Catalyst (explode + hash-partitioned aggregations, no UDFs).
100 TB shapes, per operator:

* ``bm25_topk`` — one explode filtered to the query vocabulary (tiny
  after predicate pushdown on ``token IN (...)``), per-term document
  frequencies as a ≤|Q|-row broadcast, one per-doc aggregation. The
  corpus-level scalars (N, avgdl) are a 1-row broadcast cross join.
* ``dsir_importance`` — Data Selection via Importance Resampling (Xie
  et al. 2023, arXiv:2302.03169): hashed-unigram bucket distributions.
  The two count tables are B-row aggregates (B=256 default) — broadcast
  back against the exploded token stream, one shuffle per rollup.
* ``repeated_span_metrics`` — the ExactSubstr cross-document duplicate
  detector of Lee et al. 2022 ("Deduplicating Training Data Makes
  Language Models Better", arXiv:2107.06499), re-expressed as fixed-
  width token-window hashing instead of a suffix array: a W-token
  window that appears in ≥2 documents marks duplicated text. Window
  hashes shuffle once on md5 (uniform keys, no skew); the per-window
  doc-frequency join is big-big sort-merge by design, like LSH bands.
* ``split_leakage`` — deterministic hash split (train/val/test) plus a
  content-fingerprint audit: fingerprints spanning >1 split are
  train/test leakage (the decontamination concern, measured rather than
  assumed). One fingerprint-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.datapipe.curation import _h16
from sequin_spark.datapipe.dedup import normalized, spread_for_compute


def _tokens(text_col: str) -> F.Column:
    return F.split(normalized(text_col), " ")


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 relevance of every document to ``query_terms``.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); score rounded to 4
    decimals for cross-engine determinism. Docs matching no term drop.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(_tokens(text_col)).alias("token"),
        F.size(_tokens(text_col)).alias("dl"),
    ).filter(F.col("token").isin(query_terms))
    # corpus scalars: one 1-row aggregate, broadcast via crossJoin
    stats = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl"),
    )
    tf = toks.groupBy(id_col, "token", "dl").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    # per-term document frequency (≤|Q| rows) with the corpus scalars
    # attached by an equi-join on a data-derived zero key: a literal key
    # would be constant-folded into a BroadcastNestedLoopJoin, this
    # stays a broadcast HASH join and keeps the plan-quality gate strict
    dfreq = (
        tf.groupBy("token").agg(
            F.count(F.lit(1)).cast("double").alias("df_t"))
        .withColumn("_k", F.floor(F.col("df_t") * 0).cast("long"))
        .join(
            F.broadcast(stats.withColumn(
                "_k", F.floor(F.col("n_docs") * 0).cast("long"))),
            "_k",
        )
        .drop("_k")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf")
           + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))))
    return (
        tf.join(F.broadcast(dfreq), "token")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(contrib), 4).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        )
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    min_len: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-``k`` TF-IDF keywords — the keyword-extraction /
    topic-tagging primitive (sklearn smooth-idf variant):

        idf(t)      = ln((1 + N) / (1 + df_t)) + 1
        score(d, t) = (tf / dl) * idf(t), rounded to 4

    Tokens shorter than ``min_len`` chars are dropped (punctuation /
    stopword-ish noise); ``dl`` is the count of QUALIFYING tokens, so
    the tf normalization matches what was scored.  Ranking uses the
    ROUNDED score with a token-lexicographic tiebreak, so the top-k cut
    is engine-exact (no last-ulp reorder can flip membership).

    Plan shape: one explode → (doc, token) count [shuffle 1] → df_t on
    the pair table [shuffle 2, vocabulary-sized output] → broadcast
    df_t back onto the pairs (the same bounded-vocabulary broadcast the
    tokenizer encode path justifies) → dl + row_number as two windows
    over ONE doc-keyed shuffle [shuffle 3, WindowGroupLimit prunes to
    k rows per doc map-side].
    """
    from pyspark.sql import Window

    n_docs = df.count()  # one long; the oracle uses the same scalar
    pairs = (
        df.select(F.col(id_col), F.explode(_tokens(text_col)).alias("token"))
        .filter(F.length("token") >= min_len)
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = pairs.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("df_t"))
    w_doc = Window.partitionBy(id_col)
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df_t"))) + 1.0
    scored = (
        pairs.join(F.broadcast(dfreq), "token")
        .withColumn("dl", F.sum("tf").over(w_doc))
        .withColumn("tfidf", F.round((F.col("tf") / F.col("dl")) * idf, 4))
    )
    rk = F.row_number().over(
        w_doc.orderBy(F.col("tfidf").desc(), F.col("token").asc()))
    return (
        scored.withColumn("rk", rk)
        .filter(F.col("rk") <= k)
        .select(id_col, "token", "tfidf", F.col("rk").cast("int").alias("rk"))
    )


def dsir_importance(
    df: DataFrame,
    target_pred: F.Column | None = None,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights: mean log p_target(b)/q_raw(b) over a
    document's hashed-unigram buckets (add-one smoothing both sides).

    ``target_pred`` selects the target distribution's rows (default:
    ``lang = 'en'``). High weight ⇒ the document looks like the target
    domain; resample by weight to shift the corpus mixture. Bucket
    counts are two B-row rollups over one exploded token stream —
    nothing per-document shuffles except the final mean.
    """
    if target_pred is None:
        target_pred = F.col("lang") == "en"
    # spread BEFORE the tokenize/md5 kernel: the target predicate folds
    # to one boolean pre-exchange, then the CPU-dense explode+hash runs
    # at cluster parallelism instead of on the scan's (often single)
    # split — no-op when the scan is already wide (r13 optimization
    # round, interleaved A/B min 1.24 → 0.93 s for select_dsir)

    src = spread_for_compute(df.select(
        F.col(id_col), target_pred.alias("is_target"), F.col(text_col)))
    toks = src.select(
        F.col(id_col),
        F.col("is_target"),
        F.explode(_tokens(text_col)).alias("token"),
    ).withColumn("bucket", _h16(F.col("token")) % n_buckets)
    # the B-row bucket table is read twice (totals + rates) and each
    # un-materialized read re-runs the full tokenize/explode/hash pass —
    # lazily localCheckpoint the <=n_buckets rows so the token stream is
    # scanned once for training (r13 optimization round)
    counts = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("double").alias("n_all"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("double").alias("n_target"),
    ).localCheckpoint(eager=False)
    totals = counts.agg(
        F.sum("n_all").alias("t_all"), F.sum("n_target").alias("t_target"))
    # equi-join on a data-derived zero key (literal keys constant-fold
    # into a BNLJ): broadcast hash join attaching the two scalars
    rates = (
        counts.withColumn("_k", F.floor(F.col("n_all") * 0).cast("long"))
        .join(
            F.broadcast(totals.withColumn(
                "_k", F.floor(F.col("t_all") * 0).cast("long"))),
            "_k",
        )
        .drop("_k")
        .select(
            "bucket",
            F.log((F.col("n_target") + 1.0) / (F.col("t_target") + n_buckets))
            .alias("log_p"),
            F.log((F.col("n_all") + 1.0) / (F.col("t_all") + n_buckets))
            .alias("log_q"),
        )
    )
    return (
        toks.join(F.broadcast(rates), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            # + 0.0 after the round: IEEE normalizes −0.0 + 0.0 → +0.0,
            # so a ~1e-12 sum whose SIGN differs between engines (float
            # fold order) can't surface as a "0.0 vs -0.0" hash mismatch
            # (observed at sf0.001; oracle applies the same normalization)
            (F.round(F.avg(F.col("log_p") - F.col("log_q")), 4)
             + F.lit(0.0)).alias("dsir_weight"),
        )
    )


def nb_quality_classifier(
    df: DataFrame,
    positive_pred: F.Column | None = None,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-based quality classifier: multinomial Naive Bayes over
    hashed-unigram buckets — the deterministic analog of the
    logistic-regression-on-hashed-features quality filters (GPT-3's
    WebText classifier, fastText quality models); NB's closed-form
    counts need no iterative fit, so training is two B-row rollups and
    scoring is one broadcast join, all exactly reproducible.

    ``positive_pred`` labels the high-quality training rows (default:
    the curated-source list). Per-doc score = log prior odds + Σ_tokens
    log P(b|hq)/P(b|lq) with add-one smoothing; predicted_hq = score>0.
    """
    if positive_pred is None:
        positive_pred = F.col("source").isin(
            "src0", "src1", "src2", "src3", "src4")
    # same spread-before-tokenize shape as dsir_importance (r13
    # optimization round, A/B min 1.53 → 1.27 s for quality_classifier);
    # doc_counts below stays on the raw df — it never tokenizes

    src = spread_for_compute(df.select(
        F.col(id_col), positive_pred.alias("is_hq"), F.col(text_col)))
    toks = src.select(
        F.col(id_col),
        F.col("is_hq"),
        F.explode(_tokens(text_col)).alias("token"),
    ).withColumn("bucket", _h16(F.col("token")) % n_buckets)
    # ONE tokenize pass (r14): both the training rollup and the scoring
    # probe reduce the token stream to per-(doc,bucket) integer counts,
    # so aggregate once and derive both from the checkpointed result —
    # the corpus is tokenized/hashed once instead of twice.  is_hq is
    # constant per doc, so adding it to the grouping key changes
    # nothing; the training sums become Σ cnt over the same token
    # multiset — identical integers, order-free.  The checkpoint is
    # ≤256 rows × ~24 B per doc, far smaller than the text it replaces
    # a full re-tokenize of.
    per_doc = toks.groupBy(id_col, "is_hq", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
    ).localCheckpoint(eager=False)
    counts = per_doc.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_hq"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("double").alias("n_pos"),
        F.sum(F.when(F.col("is_hq"), F.lit(0)).otherwise(F.col("cnt")))
        .cast("double").alias("n_neg"),
    )
    doc_counts = df.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(positive_pred.cast("int")).cast("double").alias("n_hq"),
    )
    totals = counts.agg(
        F.sum("n_pos").alias("t_pos"), F.sum("n_neg").alias("t_neg"))
    rates = (
        counts.withColumn("_k", F.floor(F.col("n_pos") * 0).cast("long"))
        .join(
            F.broadcast(totals.withColumn(
                "_k", F.floor(F.col("t_pos") * 0).cast("long"))),
            "_k",
        )
        .drop("_k")
        .select(
            "bucket",
            (F.log((F.col("n_pos") + 1.0) / (F.col("t_pos") + n_buckets))
             - F.log((F.col("n_neg") + 1.0) / (F.col("t_neg") + n_buckets))
             ).alias("llr"),
        )
    )
    prior = F.log((F.col("n_hq") + 1.0)
                  / (F.col("n_docs") - F.col("n_hq") + 1.0))
    # per-(doc,bucket) integer counts, then a bucket-sorted left-fold:
    # an unordered double sum over per-token llr could differ in the
    # last ulp between runs/engines and flip round(...,4) or the
    # predicted_hq>0 boundary (same hazard class as the r4
    # corpus_stats_profile driver flake)
    per_bucket = per_doc.select(id_col, "bucket", "cnt")
    return (
        per_bucket.join(F.broadcast(rates), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.collect_list(
                F.struct(F.col("bucket"),
                         (F.col("cnt") * F.col("llr")).alias("v"))
            ).alias("_terms"),
        )
        .withColumn(
            "_sum_llr",
            F.aggregate(F.sort_array("_terms"), F.lit(0.0),
                        lambda acc, x: acc + x["v"]),
        )
        .drop("_terms")
        .withColumn("_k", F.floor(F.col("_sum_llr") * 0).cast("long"))
        .join(
            F.broadcast(doc_counts.withColumn(
                "_k", F.floor(F.col("n_docs") * 0).cast("long"))),
            "_k",
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.round(F.col("_sum_llr") + prior, 4).alias("nb_score"),
            ((F.col("_sum_llr") + prior) > 0).alias("predicted_hq"),
        )
    )


def repeated_span_metrics(
    df: DataFrame,
    window: int = 15,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-span metrics: every ``window``-token
    sliding window is hashed; a hash seen in ≥2 distinct documents is a
    duplicated span. Returns per-doc window/duplicate counts + ratio.

    Documents shorter than ``window`` tokens produce zero windows (the
    size() guard — no INVALID_ARRAY_INDEX on short docs).
    """
    # Windows are generated ONCE: explode → (h, doc) pair counts → a
    # window over h for the distinct-doc frequency → per-doc rollup.
    # The naive shape (freq = self-aggregation of the exploded frame,
    # joined back to a SECOND explode of the same frame) evaluates the
    # O(tokens·window) hashing twice and shuffles three times — this
    # runs the hashing once and shuffles (h,doc) → h → doc.
    from pyspark.sql import Window

    # materialize the token array BEFORE the HOF lambda — split()
    # referenced inside `transform` re-tokenizes the whole document per
    # window position (O(tokens²) per doc; the doc_bigrams lesson)
    norm_sql = f"regexp_replace(lower({text_col}), '\\\\s+', ' ')"
    # spread before the O(tokens·window) md5 hashing: the window-hash
    # kernel is the query's dominant CPU and otherwise runs on the
    # scan's single split; no-op on wide scans (r13 optimization round,
    # interleaved A/B min 1.66 → 1.13 s for dedup_repeated_spans)

    wins = (
        spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col),
            F.expr(f"split({norm_sql}, ' ')").alias("toks"),
        )
        .select(
            F.col(id_col),
            F.expr(
                f"CASE WHEN size(toks) >= {window} THEN "
                f"transform(sequence(1, size(toks) - {window - 1}), "
                f"i -> md5(concat_ws(' ', slice(toks, i, {window})))) "
                f"ELSE array() END"
            ).alias("hashes"),
        )
        .select(F.col(id_col), F.explode_outer("hashes").alias("h"))
    )
    # one row per (h, doc): cnt = positions of h in doc (short docs keep
    # their single null-h row so they survive to the output)
    pairs = wins.groupBy("h", id_col).agg(
        F.count(F.col("h")).cast("long").alias("cnt"))
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("h"))
    scored = pairs.withColumn(
        "shared", F.when(F.col("h").isNotNull() & (n_docs >= 2),
                         F.col("cnt")).otherwise(F.lit(0)))
    return scored.groupBy(id_col).agg(
        F.sum("cnt").cast("long").alias("n_windows"),
        F.sum("shared").cast("long").alias("n_shared_windows"),
        F.round(F.sum("shared") / F.greatest(F.sum("cnt"), F.lit(1)), 4)
        .alias("shared_ratio"),
    )


def split_leakage(
    df: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic train/val/test split + leakage audit.

    Split by ``h16(doc_id) % 100`` so membership is stable under
    reshuffles and re-runs. A content fingerprint (md5 of normalized
    text) appearing in more than one split is leakage — near-duplicate
    train examples of the eval set. Returns one row per split with
    sizes and leaked-document counts.

    The leaked flag is a min≠max window over the fingerprint partition
    (⇔ count_distinct(split) ≥ 2, the only use of the count) — ONE
    normalize+md5 pass and one fp shuffle; the previous fp-count
    aggregate + join back re-ran the scan + md5 per side (the same
    rewrite split_assign_content got earlier this round; r13
    optimization round, A/B min 0.68 → 0.36 s, rows identical).
    """
    from pyspark.sql import Window

    bucket = _h16(F.col(id_col)) % 100
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    base = df.select(
        F.col(id_col),
        split.alias("split"),
        F.md5(normalized(text_col)).alias("fp"),
    ).filter(F.col("fp").isNotNull())
    # NULL fp (NULL text) rows are dropped to match the oracle's
    # equi-join form exactly: a NULL fingerprint never joins, so the
    # join shape excluded those docs from every count — the window
    # form would instead lump all NULL fps into ONE partition and
    # count two NULL-text docs in different splits as leaked (the
    # r13-advice parity trap; latent only, the fixtures have no NULL
    # text, but exactness should not depend on that)
    w_fp = Window.partitionBy("fp")
    leaked = (F.min("split").over(w_fp) != F.max("split").over(w_fp))
    return (
        base.withColumn("_leaked", leaked)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("fp").alias("n_unique_fp"),
            F.sum(F.when(F.col("_leaked"), 1).otherwise(0))
            .cast("long").alias("n_leaked_docs"),
        )
    )


def split_assign_content(
    df: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Leakage-proof split assignment: the split bucket derives from the
    CONTENT fingerprint (md5 of normalized text), not the document id,
    so byte-identical duplicates always land in the SAME split — the
    exact-dup train/test contamination ``split_leakage`` audits is
    structurally impossible here (near-dups can still cross; run the
    fuzzy-dedup family first).  The SlimPajama/RefinedWeb practice of
    splitting after content hashing, as an assignment operator.

    One fingerprint-keyed shuffle for the per-split summary; the
    assignment itself is a narrow map (fp → h16 → bucket).  Returns one
    row per split: sizes, distinct fingerprints, and the cross-split
    fingerprint count (0 by construction for exact duplicates —
    computed, not asserted, so the oracle proves it).

    The cross-split flag is a min≠max window over the fingerprint
    partition (⇔ count_distinct(split) ≥ 2, the only use of the count)
    — ONE pass and one fp shuffle; the previous fp-count aggregate +
    join back re-ran the scan + md5 per side.
    """
    fp = F.md5(normalized(text_col))
    bucket = _h16(fp) % 100
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test")
    )
    from pyspark.sql import Window

    # NULL-fp rows dropped for oracle equi-join parity (see
    # split_leakage above)
    base = df.select(F.col(id_col), fp.alias("fp"), split.alias("split")) \
        .filter(F.col("fp").isNotNull())
    w_fp = Window.partitionBy("fp")
    crossed = (F.min("split").over(w_fp) != F.max("split").over(w_fp))
    return (
        base.withColumn("_crossed", crossed)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("fp").alias("n_unique_fp"),
            F.sum(F.when(F.col("_crossed"), 1).otherwise(0))
            .cast("long").alias("n_cross_split_docs"),
        )
    )
