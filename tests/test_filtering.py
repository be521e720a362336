"""Corpus-filtering operators (datapipe/filtering.py): benchmark
decontamination, PII scrubbing, repetition gating."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from sequin_spark.datapipe.filtering import (
    PII_PATTERNS,
    decontaminate,
    pii_scrub,
    repetition_metrics,
)


@pytest.fixture(scope="module")
def corpus(spark):
    eval_text = " ".join(f"bench{i}" for i in range(20))
    return spark.createDataFrame([
        Row(doc_id=1, text="clean document about spark engines " + " ".join(
            f"w{i}" for i in range(20))),
        # full verbatim copy of the eval doc → rate 1.0
        Row(doc_id=2, text=eval_text),
        # eval text embedded inside other words → partially contaminated
        Row(doc_id=3, text="prefix words here " + eval_text + " suffix words"),
        Row(doc_id=4, text="too short"),
    ]), spark.createDataFrame([Row(doc_id=100, text=eval_text)])


def test_decontaminate_flags_overlap(corpus):
    docs, eval_set = corpus
    out = {r.doc_id: r for r in decontaminate(docs, eval_set, gram=8).collect()}
    assert not out[1].contaminated and out[1].n_contaminated == 0
    assert out[2].contaminated and out[2].contamination_rate == 1.0
    assert out[3].contaminated and 0 < out[3].contamination_rate < 1.0
    # short doc: no 8-grams at all → zero counts, not a crash or a drop
    assert out[4].n_grams == 0 and not out[4].contaminated
    assert set(out) == {1, 2, 3, 4}


def test_decontaminate_broadcasts_eval_side(corpus):
    docs, eval_set = corpus
    plan = decontaminate(docs, eval_set)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval side must never shuffle the corpus


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="mail a.b+c@ex.co or x@y.org, ssn 123-45-6789, "
                           "ip 10.0.0.1, call 555-867-5309"),
        Row(doc_id=2, text="nothing sensitive here"),
    ])
    out = {r.doc_id: r for r in pii_scrub(df).collect()}
    r = out[1]
    assert (r.n_email, r.n_ssn, r.n_ip, r.n_phone) == (2, 1, 1, 1)
    assert "<EMAIL>" in r.scrubbed and "<SSN>" in r.scrubbed
    assert "<IP>" in r.scrubbed and "<PHONE>" in r.scrubbed
    assert "123-45-6789" not in r.scrubbed and "@" not in r.scrubbed
    clean = out[2]
    assert (clean.n_email, clean.n_ssn, clean.n_ip, clean.n_phone) == (0, 0, 0, 0)
    assert clean.scrubbed == "nothing sensitive here"


def test_pii_patterns_are_re2_safe():
    # the DuckDB oracle runs the same patterns under RE2: no lookarounds,
    # no backreferences
    for _, pat, _ in PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert "\\1" not in pat


def test_repetition_metrics_gates_spam(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"unique{i}" for i in range(30))),
        Row(doc_id=2, text="spam ham " * 40),
        Row(doc_id=3, text=""),
    ])
    out = {r.doc_id: r for r in repetition_metrics(df).collect()}
    good, spam, empty = out[1], out[2], out[3]
    assert good.keep and good.dup_word_frac == 0.0
    assert not spam.keep
    assert spam.dup_word_frac > 0.9 and spam.dup_2gram_frac > 0.9
    assert spam.top_word == "ham"  # 40× each; alphabetical tie-break
    assert empty.n_words == 0 and empty.dup_word_frac == 0.0


# ---------------------------------------------------------------------------
# filter funnel


def test_filter_funnel_cascade_accounting(spark):
    """Each doc is charged to its FIRST violated rule; the funnel
    conserves counts: reached[i+1] == survived[i], drops + kept ==
    total, and (kept) row carries the survivor count."""
    from sequin_spark.datapipe.filtering import filter_funnel

    df = spark.createDataFrame(
        [Row(doc_id=i, a=a, b=b) for i, (a, b) in enumerate(
            [(1, 1), (1, 0), (0, 1), (0, 1), (0, 0), (0, 0), (0, 0)])]
    )
    rules = [("rule_a", F.col("a") == 1), ("rule_b", F.col("b") == 1)]
    rows = {r["rule"]: r for r in filter_funnel(df, rules).collect()}
    # docs 0,1 violate a (doc 0 also violates b but is charged to a);
    # docs 2,3 violate b; 4,5,6 pass
    assert rows["rule_a"]["n_reached"] == 7
    assert rows["rule_a"]["n_dropped"] == 2
    assert rows["rule_a"]["n_survived"] == 5
    assert rows["rule_b"]["n_reached"] == 5
    assert rows["rule_b"]["n_dropped"] == 2
    assert rows["rule_b"]["n_survived"] == 3
    assert rows["(kept)"]["n_reached"] == 3
    assert rows["(kept)"]["n_dropped"] == 0
    assert rows["(kept)"]["n_survived"] == 3


def test_filter_funnel_null_predicate_cascades_on(spark):
    """A NULL predicate result (e.g. a ratio whose denominator is 0)
    must NOT drop the row — it cascades to later rules."""
    from sequin_spark.datapipe.filtering import filter_funnel

    df = spark.createDataFrame([Row(doc_id=1, x=None), Row(doc_id=2, x=5)])
    rules = [("null_rule", F.col("x") > 3)]
    rows = {r["rule"]: r for r in filter_funnel(df, rules).collect()}
    assert rows["null_rule"]["n_dropped"] == 1   # only doc 2
    assert rows["(kept)"]["n_survived"] == 1     # doc 1 cascades through


def test_standard_quality_rules_single_pass_plan(spark):
    """The annotated metrics must come from ONE scan — no join, no
    explode-shuffle: the funnel's only exchange is the ≤10-key groupBy."""
    from sequin_spark.datapipe.filtering import (filter_funnel,
                                                 standard_quality_rules)

    df = spark.createDataFrame(
        [Row(doc_id=i, text="the quick brown fox of a lazy dog " * 4)
         for i in range(10)])
    annotated, rules = standard_quality_rules(df)
    plan = filter_funnel(annotated, rules)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    # corpus-side scan feeds a single hash aggregate; the only joins are
    # over the <=10-row rules/drops tables (broadcast)
    assert plan.count("Exchange hashpartitioning") <= 2


def test_report_card_conserves_documents(spark):
    """Per-source accounting must conserve: docs = quality_dropped +
    dup_dropped + train + val + test, and the report's quality drops
    equal the funnel's total drops on the same corpus."""
    from pyspark.sql import functions as F

    from sequin_spark.queries_datapipe import (q_corpus_report_card,
                                               q_text_filter_funnel)

    sf = "/root/testdata/sf0.001"
    card = q_corpus_report_card(spark, sf).collect()
    for r in card:
        assert r.n_docs == (r.n_quality_dropped + r.n_dup_dropped
                            + r.n_train + r.n_val + r.n_test)
    funnel = {r.rule: r for r in q_text_filter_funnel(spark, sf).collect()}
    total_funnel_drops = sum(
        r.n_dropped for r in funnel.values() if r.rule != "(kept)")
    assert sum(r.n_quality_dropped for r in card) == total_funnel_drops


def test_filter_funnel_streaming_twin_update_mode(spark, tmp_path):
    """The funnel's corpus pass is ONE update-mode streaming aggregation:
    groupBy(first_violation).count over a document stream must equal the
    batch funnel drop counts over the union of all micro-batches (the
    metric select is deterministic and narrow, so it streams as-is)."""
    from pyspark.sql import functions as F

    from sequin_spark.datapipe.filtering import (filter_funnel,
                                                 first_violation,
                                                 standard_quality_rules)

    docs = [
        (i, ("the quick brown fox of a lazy dog jumping over fences in "
             "the morning light with a friend of mine near the old barn "
             * (1 + i % 3)))
        for i in range(40)
    ] + [(100 + i, "tiny doc") for i in range(6)]       # too_short
    src = str(tmp_path / "src")
    schema = "doc_id long, text string"
    half = len(docs) // 2
    spark.createDataFrame(docs[:half], schema).coalesce(1) \
        .write.mode("append").parquet(src)

    batch_df = spark.createDataFrame(docs, schema)
    annotated_b, rules = standard_quality_rules(batch_df)
    want = {r.rule_idx: r.n_dropped
            for r in filter_funnel(annotated_b, rules).collect()
            if r.rule != "(kept)"}
    want[len(rules)] = next(
        r.n_survived for r in filter_funnel(annotated_b, rules).collect()
        if r.rule == "(kept)")

    stream = spark.readStream.schema(schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    annotated_s, rules_s = standard_quality_rules(stream)
    counts = (annotated_s
              .select(first_violation(rules_s).alias("rule_idx"))
              .groupBy("rule_idx").agg(F.count("*").alias("n")))
    q = (counts.writeStream.format("memory").queryName("funnel_stream")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .outputMode("update").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(docs[half:], schema).coalesce(1) \
            .write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()
    # memory sink in update mode appends changed rows; keep the LAST
    # count per rule_idx via max (counts only grow)
    got2 = {}
    for r in spark.sql(
            "SELECT rule_idx, max(n) AS n FROM funnel_stream "
            "GROUP BY rule_idx").collect():
        got2[r.rule_idx] = r.n
    assert got2 == {k: v for k, v in want.items() if v > 0}
