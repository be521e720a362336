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
