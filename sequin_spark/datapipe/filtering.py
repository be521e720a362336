"""Pretraining-corpus filtering operators: benchmark decontamination,
PII scrubbing, repetition-based quality gating.

These are the safety/quality passes a training-data pipeline runs after
dedup (datapipe/dedup.py) and before sampling (datapipe/curation.py):

- ``decontaminate``: flag corpus documents sharing word n-grams with an
  evaluation/benchmark set, so test data never leaks into training. The
  standard n-gram-collision method (as published for GPT-3/PaLM/Llama
  dataset curation): any eval 8-gram appearing verbatim in a training
  doc marks it contaminated.
- ``pii_scrub``: redact emails / SSNs / IPv4s / phone numbers with
  typed placeholder tokens and count replacements per document.
- ``repetition_metrics``: Gopher-style repetition ratios (duplicate
  word / 2-gram / 3-gram fractions, top-word character share) with a
  composite keep flag.

All pure Catalyst — regex + array built-ins + one keyed aggregation;
no Python UDFs anywhere.

Scale notes (100 TB): the eval-gram side of decontamination is small by
construction (benchmarks are ~10^5 grams) and broadcast; the corpus side
is a narrow projection + explode consumed map-side by the broadcast hash
join, then one doc_id-keyed agg (combiner-friendly). pii_scrub is a pure
scan. repetition_metrics' only shuffle is the doc_id-keyed word count
for the top-word share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import normalized, word_shingles

# ---------------------------------------------------------------------------
# decontamination


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 8,
    threshold: float = 0.05,
) -> DataFrame:
    """Per-corpus-doc contamination against ``eval_set``: the fraction of
    the doc's word ``gram``-grams that appear verbatim anywhere in the
    eval set. Returns (id, n_grams, n_contaminated, contamination_rate,
    contaminated) — ``contaminated`` when rate ≥ threshold OR the doc
    contains ≥ 1 eval gram at all and threshold == 0.

    Join is keyed on the gram string itself; the eval side is
    deduplicated and broadcast (benchmark sets are tiny next to the
    corpus), so the corpus side never shuffles — only the final
    per-doc count aggregation does.
    """
    def grams_of(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        return df.select(
            *cols, F.split(normalized(text_col), " ").alias("w")
        ).select(*cols, word_shingles("w", gram).alias("g"))

    corpus_grams = grams_of(corpus, keep_id=True).select(
        id_col, F.explode_outer(F.array_distinct("g")).alias("gram")
    )
    eval_grams = (
        grams_of(eval_set, keep_id=False)
        .select(F.explode("g").alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    joined = corpus_grams.join(F.broadcast(eval_grams), "gram", "left")
    out = joined.groupBy(id_col).agg(
        F.count("gram").alias("n_grams"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("n_contaminated"),
    )
    rate = F.when(
        F.col("n_grams") > 0, F.col("n_contaminated") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_contaminated"),
        F.round(rate, 6).alias("contamination_rate"),
    ).withColumn(
        "contaminated",
        (F.col("n_contaminated") > 0) & (F.col("contamination_rate") >= threshold),
    )


# ---------------------------------------------------------------------------
# PII scrubbing

# Applied in list order (SSN before phone: a 3-2-4 SSN must not be
# half-eaten by the looser phone pattern). RE2-safe: no lookarounds or
# backreferences, so the same patterns run in Spark (Java regex) and
# DuckDB (RE2) with identical matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    # optional +CC prefix, then 3-3-4 with optional separators — covers
    # "555-867-5309", "(555) 867-5309", "+1 555 867 5309", "5558675309"
    ("phone", r"(\+?[0-9]{1,2}[ .-]?)?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}\b",
     "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact PII with typed placeholders; count matches per kind BEFORE
    replacement (counts are on the original text, so earlier
    replacements can't shadow later counters). Returns
    (id, n_email, n_ssn, n_ip, n_phone, scrubbed).
    """
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(
            f"n_{kind}"
        )
        for kind, pat, _ in PII_PATTERNS
    ]
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


# ---------------------------------------------------------------------------
# repetition / quality gating

# Gopher (Rae et al. 2021, table A1) rejects documents whose repetition
# ratios exceed these; values here follow the paper's word/2-gram bands.
REP_THRESHOLDS = {
    "dup_word_frac": 0.60,
    "dup_2gram_frac": 0.40,
    "dup_3gram_frac": 0.30,
    "top_word_char_frac": 0.20,
}


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition ratios + composite ``keep`` flag:

    - ``dup_word_frac``   = 1 − distinct words / words
    - ``dup_2gram_frac``  = 1 − distinct 2-grams / 2-grams
    - ``dup_3gram_frac``  = 1 − distinct 3-grams / 3-grams
    - ``top_word_char_frac`` = chars of the most frequent word / chars
      of all words (ties broken by the alphabetically-first word)

    The first three are narrow array expressions (``array_distinct`` on
    the token array — no shuffle); the top-word share is one
    (id, word)-keyed count with map-side partial aggregation.
    """
    from sequin_spark.datapipe.dedup import spread_for_compute

    # the shingle/array_distinct kernels below are CPU-dense per-row
    # work; spread so a single-split scan doesn't serialize them
    # (no-op at cluster scale)
    words = spread_for_compute(
        df.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col), F.split(normalized(text_col), " ").alias("w")
    ).withColumn("w", F.filter("w", lambda x: x != F.lit("")))

    def dup_frac(col: F.Column) -> F.Column:
        return F.when(
            F.size(col) > 0,
            F.round(1.0 - F.size(F.array_distinct(col)) / F.size(col), 6),
        ).otherwise(F.lit(0.0))

    narrow = words.select(
        F.col(id_col),
        F.col("w"),
        F.size("w").alias("n_words"),
        dup_frac(F.col("w")).alias("dup_word_frac"),
        dup_frac(word_shingles("w", 2)).alias("dup_2gram_frac"),
        dup_frac(word_shingles("w", 3)).alias("dup_3gram_frac"),
        F.aggregate("w", F.lit(0), lambda acc, x: acc + F.length(x)).alias(
            "n_word_chars"
        ),
    )

    # top word per doc as a NARROW fold: sort the token array, then one
    # pass tracking the current and best run (count desc, alphabetical
    # tie-break via strictly-greater on the sorted order) — no explode,
    # no (id, word) shuffle, no join; the whole operator is scan-local
    top_expr = F.expr(
        "CASE WHEN size(w) = 0 THEN "
        "named_struct('word', CAST(NULL AS STRING), 'n', 0) "
        "ELSE aggregate(array_sort(w), "
        "named_struct('cur', CAST(NULL AS STRING), 'curn', 0, "
        "             'best', CAST(NULL AS STRING), 'bestn', 0), "
        "(acc, x) -> IF(x <=> acc.cur, "
        "  named_struct('cur', acc.cur, 'curn', acc.curn + 1, "
        "               'best', acc.best, 'bestn', acc.bestn), "
        "  IF(acc.curn > acc.bestn, "
        "    named_struct('cur', x, 'curn', 1, "
        "                 'best', acc.cur, 'bestn', acc.curn), "
        "    named_struct('cur', x, 'curn', 1, "
        "                 'best', acc.best, 'bestn', acc.bestn))), "
        "acc -> IF(acc.curn > acc.bestn, "
        "  named_struct('word', acc.cur, 'n', acc.curn), "
        "  named_struct('word', acc.best, 'n', acc.bestn))) END"
    )

    out = narrow.withColumn("t", top_expr).select(
        F.col(id_col),
        "n_words",
        "dup_word_frac",
        "dup_2gram_frac",
        "dup_3gram_frac",
        F.col("t.word").alias("top_word"),
        F.when(
            F.col("n_word_chars") > 0,
            F.round(
                F.col("t.n")
                * F.length(F.coalesce(F.col("t.word"), F.lit("")))
                / F.col("n_word_chars"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("top_word_char_frac"),
    )
    keep = (
        (F.col("dup_word_frac") <= REP_THRESHOLDS["dup_word_frac"])
        & (F.col("dup_2gram_frac") <= REP_THRESHOLDS["dup_2gram_frac"])
        & (F.col("dup_3gram_frac") <= REP_THRESHOLDS["dup_3gram_frac"])
        & (F.col("top_word_char_frac") <= REP_THRESHOLDS["top_word_char_frac"])
    )
    return out.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# filter funnel — ordered rule cascade with per-rule accounting


def first_violation(rules: "list[tuple[str, F.Column]]") -> F.Column:
    """Index of the FIRST violated rule (cascade attribution), or
    len(rules) when every rule passes — NULL predicate results count as
    not-violated.  Shared by filter_funnel and pipeline compositions
    (e.g. the corpus report card) so the attribution semantics cannot
    drift between the funnel table and downstream accounting."""
    return F.coalesce(
        F.array_min(F.array(*[
            F.when(cond, F.lit(i)) for i, (_, cond) in enumerate(rules)
        ])),
        F.lit(len(rules)),
    )


def filter_funnel(
    df: DataFrame,
    rules: "list[tuple[str, F.Column]]",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ordered quality-rule cascade with per-rule funnel accounting —
    the "how many documents did each filter drop, in order" table every
    training-data pipeline publishes next to its corpus (C4 reports
    per-rule retention, Gopher its appendix-A filter cascade; the
    reference's closest analog is per-consumer filter metrics,
    lib/sequin/metrics.ex).

    ``rules`` is an ORDERED list of (name, violation_predicate) pairs
    evaluated against ``df``'s columns; a document is charged to the
    FIRST rule it violates (cascade semantics: later rules only see
    survivors).  A NULL predicate result counts as not-violated (the
    row cascades on), so metric divisions by zero never silently drop
    documents.

    Output: one row per rule plus a final ``(kept)`` row —
    (rule_idx, rule, n_reached, n_dropped, n_survived).

    Scale shape: ONE narrow pass computes the first-violation index
    (callers should compute metric columns in the same select — see
    standard_quality_rules), one groupBy over at most len(rules)+1
    first-violation keys with map-side combine, then a tiny window over
    the ≤(len(rules)+1)-row funnel table — the funnel never leaves
    kilobyte scale regardless of corpus size."""
    from pyspark.sql import Window

    kept_idx = len(rules)
    first_fail = first_violation(rules)
    drops = (
        df.select(first_fail.alias("rule_idx"))
        .groupBy("rule_idx")
        .agg(F.count("*").alias("_hit"))
    )
    spark = df.sparkSession
    rules_df = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(rules)]
        + [(kept_idx, "(kept)")],
        "rule_idx int, rule string",
    )
    joined = (
        rules_df.join(F.broadcast(drops), "rule_idx", "left")
        .select("rule_idx", "rule",
                F.coalesce("_hit", F.lit(0)).cast("long").alias("_hit"))
    )
    w_all = Window.orderBy("rule_idx").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_prior = Window.orderBy("rule_idx").rowsBetween(
        Window.unboundedPreceding, -1)
    return (
        joined.select(
            "rule_idx", "rule",
            (F.sum("_hit").over(w_all)
             - F.coalesce(F.sum("_hit").over(w_prior), F.lit(0)))
            .cast("long").alias("n_reached"),
            F.when(F.col("rule_idx") == kept_idx, F.lit(0))
            .otherwise(F.col("_hit")).cast("long").alias("n_dropped"),
        )
        .withColumn(
            "n_survived",
            (F.col("n_reached") - F.col("n_dropped")).cast("long"))
    )


def standard_quality_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    keep_cols: tuple = (),
) -> "tuple[DataFrame, list[tuple[str, F.Column]]]":
    """The C4/Gopher-shaped rule set over raw text: returns (annotated,
    rules) ready for filter_funnel.  Every metric is computed in ONE
    narrow select over the scan (token-array ops, no explode, no join)
    — the same formulas quality_score / repetition_metrics use, inlined
    so the funnel is a single-pass plan (joining those operators back
    on id would shuffle the corpus for columns the scan already had).
    Thresholds are the published C4/Gopher shapes scaled to the short
    synthetic docs; production corpora pass their own rule list."""
    norm = normalized(text_col)
    sh2 = word_shingles("_w", 2)
    annotated = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        norm.alias("_nt"),
        F.split(norm, " ").alias("_w"),
    ).select(
        id_col, *keep_cols, "_nt", "_w",
        F.length("_nt").alias("n_chars"),
        F.size("_w").alias("n_tokens"),
        F.size(F.regexp_extract_all("_nt", F.lit(r"[0-9]"), F.lit(0)))
        .alias("n_digits"),
        F.size(F.regexp_extract_all(
            "_nt", F.lit(r"\b(the|a|of|and|in|to)\b"), F.lit(0)))
        .alias("stop_hits"),
        F.when(F.size("_w") > 0,
               F.round(1.0 - F.size(F.array_distinct("_w")) / F.size("_w"),
                       6))
        .otherwise(F.lit(0.0)).alias("dup_word_frac"),
        F.when(F.size(sh2) > 0,
               F.round(1.0 - F.size(F.array_distinct(sh2)) / F.size(sh2), 6))
        .otherwise(F.lit(0.0)).alias("dup_2gram_frac"),
    ).withColumn(
        "avg_token_len",
        (F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens"),
    )
    rules = [
        ("too_short", F.col("n_tokens") < 16),
        ("too_long", F.col("n_tokens") > 2000),
        ("avg_token_len_oob",
         (F.col("avg_token_len") < 3) | (F.col("avg_token_len") > 10)),
        ("digit_heavy", F.col("n_digits") / F.col("n_chars") > 0.15),
        ("low_stopword", F.col("stop_hits") < 2),
        ("dup_words", F.col("dup_word_frac") > 0.6),
        ("dup_2grams", F.col("dup_2gram_frac") > 0.35),
        ("curly_brace", F.col("_nt").contains("{")),
        ("lorem_ipsum", F.col("_nt").contains("lorem ipsum")),
    ]
    return annotated, rules
