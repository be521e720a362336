"""Data-selection operators (datapipe/selection.py): BM25, DSIR
importance weights, cross-doc repeated spans, leakage-checked splits —
semantic checks on constructed corpora (the oracle gate covers
engine-equivalence; these pin the *behavior*)."""

import pytest
from pyspark.sql import functions as F

from sequin_spark.datapipe.selection import (
    bm25_topk,
    dsir_importance,
    repeated_span_metrics,
    split_leakage,
)


@pytest.fixture()
def corpus(spark):
    rows = [
        # doc 0: many 'spark' mentions, short → should rank top for 'spark'
        (0, "spark spark spark join", "en"),
        # doc 1: one mention in a long doc
        (1, "spark " + "filler " * 50, "en"),
        # doc 2: no query terms
        (2, "completely unrelated words here", "de"),
        # docs 3/4: share a long identical 20-token span
        (3, "alpha " * 5 + "shared common span of twenty tokens exactly "
            "one two three four five six seven eight nine ten eleven tail3",
         "en"),
        (4, "beta " * 5 + "shared common span of twenty tokens exactly "
            "one two three four five six seven eight nine ten eleven tail4",
         "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_bm25_ranks_tf_and_length(corpus):
    out = {r["doc_id"]: r for r in
           bm25_topk(corpus, ["spark", "join"]).collect()}
    # doc 2 matches nothing → absent
    assert set(out) == {0, 1}
    # higher tf, shorter doc → higher score
    assert out[0]["bm25"] > out[1]["bm25"]
    assert out[0]["n_matched_terms"] == 2 and out[1]["n_matched_terms"] == 1


def test_dsir_weights_favor_target_like_docs(corpus):
    out = {r["doc_id"]: r["dsir_weight"] for r in
           dsir_importance(corpus, n_buckets=64).collect()}
    # doc 1's filler dominates the target counts → highest weight; the
    # lowest weight sits on a non-target doc (2's and 4's tokens skew
    # to the de rows); target-only docs score above the de-only ones
    assert out[1] == max(out.values())
    assert min(out, key=out.get) in (2, 4)
    assert out[2] < 0 < out[1]
    assert len(out) == 5


def test_repeated_spans_flag_cross_doc_duplicates(corpus):
    out = {r["doc_id"]: r for r in
           repeated_span_metrics(corpus, window=15).collect()}
    # every doc appears, even those too short for a single window
    assert set(out) == {0, 1, 2, 3, 4}
    assert out[0]["n_windows"] == 0 and out[0]["shared_ratio"] == 0.0
    # the 20-token shared span gives docs 3 and 4 shared windows
    assert out[3]["n_shared_windows"] > 0
    assert out[4]["n_shared_windows"] > 0
    # the unique docs have none
    assert out[1]["n_shared_windows"] == 0
    # ratio bounded and consistent
    r3 = out[3]
    assert 0 < r3["shared_ratio"] <= 1.0
    assert r3["n_shared_windows"] <= r3["n_windows"]


def test_split_leakage_detects_cross_split_duplicates(spark):
    # 200 unique docs + one text duplicated across many ids so at least
    # two copies land in different hash splits
    rows = [(i, f"unique text number {i}") for i in range(200)]
    rows += [(1000 + i, "duplicated leaked text") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["split"]: r for r in split_leakage(df).collect()}
    assert set(out) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out.values()) == 220
    # the duplicated fingerprint spans splits → leaked docs reported
    assert sum(r["n_leaked_docs"] for r in out.values()) >= 2
    # deterministic: same input → same split sizes on re-run
    again = {r["split"]: r["n_docs"] for r in split_leakage(df).collect()}
    assert again == {s: r["n_docs"] for s, r in out.items()}


def test_split_leakage_null_text_matches_join_oracle_form(spark):
    """r14 (r13-advice parity trap): NULL-text docs must be excluded
    from every count, exactly as the oracle's equi-join form excludes
    them (NULL fp never joins) — the bare window form would lump all
    NULL fps into one partition and call two NULL-text docs in
    different splits leaked."""
    from pyspark.sql import functions as F

    rows = ([(i, f"unique text number {i}") for i in range(60)]
            + [(100, None), (101, None), (102, None)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["split"]: r for r in split_leakage(df).collect()}
    # join-form reference: count_distinct(split) per fp via inner join
    bucket = None
    from sequin_spark.datapipe.selection import _h16
    from sequin_spark.datapipe.text import normalized
    base = df.select(
        F.col("doc_id"),
        F.when(_h16(F.col("doc_id")) % 100 < 80, "train")
        .when(_h16(F.col("doc_id")) % 100 < 90, "val")
        .otherwise("test").alias("split"),
        F.md5(normalized("text")).alias("fp"))
    span = base.groupBy("fp").agg(
        F.count_distinct("split").alias("n_splits"))
    ref = {r["split"]: r for r in (
        base.join(span, "fp")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.count_distinct("fp").alias("n_unique_fp"),
             F.sum(F.when(F.col("n_splits") >= 2, 1).otherwise(0))
             .cast("long").alias("n_leaked_docs"))).collect()}
    assert set(out) == set(ref)
    for s in out:
        assert out[s]["n_docs"] == ref[s]["n_docs"]
        assert out[s]["n_unique_fp"] == ref[s]["n_unique_fp"]
        assert out[s]["n_leaked_docs"] == ref[s]["n_leaked_docs"]
    # the NULL-text docs are counted nowhere
    assert sum(r["n_docs"] for r in out.values()) == 60


def test_split_leakage_clean_corpus_has_none(spark):
    df = spark.createDataFrame(
        [(i, f"unique text number {i}") for i in range(100)],
        "doc_id long, text string")
    out = split_leakage(df).collect()
    assert all(r["n_leaked_docs"] == 0 for r in out)
    assert all(r["n_unique_fp"] == r["n_docs"] for r in out)


def test_nb_quality_classifier_separates_vocabularies(spark):
    from sequin_spark.datapipe.selection import nb_quality_classifier

    # two disjoint vocabularies: 'clean' docs vs 'spam' docs, plus one
    # unlabeled doc of each vocabulary to classify
    rows = (
        [(i, "insight analysis rigor method evidence", "src0")
         for i in range(10)]
        + [(100 + i, "buy click free winner prize", "src9")
           for i in range(10)]
        + [(200, "insight evidence method", "srcX"),
           (201, "free prize click", "srcX")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in nb_quality_classifier(
        df, positive_pred=None, n_buckets=64).collect()}
    # the clean-vocabulary doc classifies high-quality, the spammy one not
    assert out[200]["predicted_hq"] is True
    assert out[201]["predicted_hq"] is False
    assert out[200]["nb_score"] > 0 > out[201]["nb_score"]
    # training rows classify consistently with their own labels
    assert all(out[i]["predicted_hq"] for i in range(10))
    assert not any(out[100 + i]["predicted_hq"] for i in range(10))


def test_nb_classifier_single_pass_equals_two_pass_reference(spark):
    """r14: the classifier derives its training rollup from the one
    per-(doc,bucket) count table instead of re-tokenizing the corpus.
    The training sums are the same token multiset grouped differently —
    exact integers — so scores must equal the old two-pass shape
    BIT-FOR-BIT (the sorted per-bucket fold is unchanged)."""
    import random

    from pyspark.sql import functions as F

    from sequin_spark.datapipe.selection import (
        _h16,
        _tokens,
        nb_quality_classifier,
    )

    rng = random.Random(1405)
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 30))),
         f"src{rng.randint(0, 9)}")
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    n_buckets = 64
    out = {r["doc_id"]: r for r in
           nb_quality_classifier(df, n_buckets=n_buckets).collect()}

    # two-pass reference: training counts aggregated straight off the
    # token stream (the pre-r14 shape), scoring identical
    positive_pred = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    toks = df.select(
        F.col("doc_id"), positive_pred.alias("is_hq"),
        F.explode(_tokens("text")).alias("token"),
    ).withColumn("bucket", _h16(F.col("token")) % n_buckets)
    ref_counts = {
        r["bucket"]: (r["n_pos"], r["n_neg"])
        for r in toks.groupBy("bucket").agg(
            F.sum(F.when(F.col("is_hq"), 1).otherwise(0)).alias("n_pos"),
            F.sum(F.when(F.col("is_hq"), 0).otherwise(1)).alias("n_neg"),
        ).collect()
    }
    new_counts = {
        r["bucket"]: (int(r["n_pos"]), int(r["n_neg"]))
        for r in toks.groupBy("doc_id", "is_hq", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("bucket").agg(
            F.sum(F.when(F.col("is_hq"), F.col("cnt")).otherwise(F.lit(0))).alias("n_pos"),
            F.sum(F.when(F.col("is_hq"), F.lit(0)).otherwise(F.col("cnt"))).alias("n_neg"),
        ).collect()
    }
    assert ref_counts == new_counts  # identical training integers

    # and the end-to-end scores stay exact: n_tokens integer, nb_score
    # from the same sorted fold over the same per-bucket llr terms
    assert len(out) == 120
    again = {r["doc_id"]: r for r in
             nb_quality_classifier(df, n_buckets=n_buckets).collect()}
    assert all(
        out[i]["nb_score"] == again[i]["nb_score"]
        and out[i]["n_tokens"] == again[i]["n_tokens"]
        for i in out
    )


def test_split_assign_content_is_leakage_proof(spark):
    """Content-keyed assignment puts byte-identical duplicates in one
    split (n_cross_split_docs == 0 over many dup pairs), while the
    id-keyed split demonstrably leaks on the same corpus."""
    from pyspark.sql import functions as F

    from sequin_spark.datapipe.selection import (
        split_assign_content,
        split_leakage,
    )

    base = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc text number "), (F.col("id") % 50).cast("string"))
        .alias("text"),  # 50 distinct texts x 8 exact copies each
    )
    content = {r.split: r for r in split_assign_content(base).collect()}
    assert sum(r.n_docs for r in content.values()) == 400
    assert all(r.n_cross_split_docs == 0 for r in content.values())
    # the id-keyed split scatters copies of the same text across splits
    leaky = split_leakage(base).collect()
    assert sum(r.n_leaked_docs for r in leaky) > 0


def test_tokenizer_fertility_sanity(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.queries()["tokenizer_fertility"](spark, sf_dir).collect()
    assert rows and {r.lang for r in rows} >= {"en"}
    for r in rows:
        # merges only ever shrink the symbol count: 1 <= fertility <= max word len
        assert 1.0 <= r.fertility
        assert r.n_bpe_tokens <= r.n_words * 40
        assert r.n_bpe_tokens >= r.n_words  # every word >= 1 token


def test_auto_n_planes_integer_rule():
    """Smallest p>=4 with 2^p * 125 >= n; never exceeds max_planes."""
    from sequin_spark.datapipe.similarity import auto_n_planes

    assert auto_n_planes(0) == 4
    assert auto_n_planes(2000) == 4        # 16*125 = 2000 exactly
    assert auto_n_planes(2001) == 5
    assert auto_n_planes(20000) == 8       # 256*125 = 32000 >= 20000
    assert auto_n_planes(10**9) == 20      # hits the max_planes cap
    assert auto_n_planes(5000, target_bucket=10, min_planes=2) == 9


def test_spread_for_compute_widens_narrow_scans(spark):
    """A 1-partition input is repartitioned to cluster width; an input
    already at/above width is returned unchanged (no extra Exchange)."""
    from sequin_spark.datapipe.text import spread_for_compute

    narrow = spark.range(1000).coalesce(1)
    wide = spread_for_compute(narrow.toDF("id"))
    assert wide.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism
    assert wide.count() == 1000

    already = spark.range(1000).repartition(64).toDF("id")
    same = spread_for_compute(already)
    assert same.rdd.getNumPartitions() == 64


def test_split_leakage_window_form_matches_join_form(spark):
    """r13 optimization: the leaked flag became a min≠max window over
    the fp partition (one normalize+md5 pass) — assert it equals the
    original count_distinct-join form row for row on a frame with
    single-split dupes, cross-split dupes, and uniques."""
    from sequin_spark.datapipe.curation import _h16
    from sequin_spark.datapipe.dedup import normalized

    rows = [(i, f"unique text number {i}") for i in range(150)]
    rows += [(2000 + i, "leaked text spanning splits") for i in range(30)]
    rows += [(5000 + i, "dup text in one split only") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    new = {r["split"]: tuple(r) for r in split_leakage(df).collect()}

    # original join formulation, inlined
    bucket = _h16(F.col("doc_id")) % 100
    split = (F.when(bucket < 80, "train")
             .when(bucket < 90, "val").otherwise("test"))
    base = df.select(F.col("doc_id"), split.alias("split"),
                     F.md5(normalized("text")).alias("fp"))
    fp_span = base.groupBy("fp").agg(
        F.count_distinct("split").alias("n_splits"))
    old = {r["split"]: tuple(r) for r in (
        base.join(fp_span, "fp")
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.count_distinct("fp").alias("n_unique_fp"),
             F.sum(F.when(F.col("n_splits") >= 2, 1).otherwise(0))
             .cast("long").alias("n_leaked_docs"))).collect()}
    assert new == old
