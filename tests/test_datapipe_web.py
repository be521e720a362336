"""URL canonicalization/dedup, line-level dedup, bigram-LM scoring
(datapipe/web.py, dedup.py:line_dedup, text.py:bigram_lm_scores)."""

import math

from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import line_dedup
from sequin_spark.datapipe.text import bigram_lm_scores
from sequin_spark.datapipe.web import canonicalize_url, url_dedup


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r[0] for r in
            df.select(canonicalize_url(F.col("url"))).collect()]


def test_canonicalize_url_cases(spark):
    cases = {
        # scheme + www + fragment + trailing slash all normalize away
        "https://www.Example.com/a/#top": "example.com/a",
        "http://example.com/a": "example.com/a",
        # tracking params dropped; surviving params sorted
        "https://example.com/p?utm_source=x&b=2&a=1": "example.com/p?a=1&b=2",
        "https://example.com/p?a=1&b=2&fbclid=zz": "example.com/p?a=1&b=2",
        # all params tracking → no query at all
        "https://example.com/p?utm_campaign=x&gclid=1": "example.com/p",
        # bare host: the root slash is itself trailing → host-only form
        "https://www.example.com/": "example.com",
        "example.com/path": "example.com/path",
    }
    got = _canon(spark, list(cases))
    assert got == list(cases.values())


def test_url_dedup_collapses_variants(spark):
    df = spark.createDataFrame(
        [(1, "https://www.site.com/x?id=1&utm_source=a"),
         (2, "http://site.com/x/?utm_campaign=b&id=1"),
         (3, "https://site.com/y?id=1")],
        ["doc_id", "url"],
    )
    rows = {r.doc_id: r for r in url_dedup(df).collect()}
    assert rows[1].canonical_url == rows[2].canonical_url == "site.com/x?id=1"
    assert rows[1].keep_id == 1 and not rows[1].is_dup
    assert rows[2].keep_id == 1 and rows[2].is_dup
    assert not rows[3].is_dup


BOILER = "subscribe to our newsletter for daily updates now"  # 8 words


def test_line_dedup_removes_cross_doc_chunks(spark):
    # 8-word-aligned texts so the boilerplate chunk is chunk-identical
    uniq1 = "alpha beta gamma delta epsilon zeta eta theta"
    uniq2 = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"{BOILER} {uniq1}"),
         (2, f"{BOILER} {uniq2}"),
         (3, uniq2)],  # uniq2 now appears in docs 2 and 3 → removed too
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in line_dedup(df).collect()}
    assert rows[1].clean_text == uniq1 and rows[1].n_removed == 1
    # doc 2 loses both the boilerplate and the uniq2 chunk
    assert rows[2].clean_text == "" and rows[2].n_removed == 2
    # doc 3 is fully duplicated away but still present in the output
    assert rows[3].clean_text == "" and rows[3].n_chunks == 1


def test_line_dedup_order_preserved(spark):
    a = "a1 a2 a3 a4 a5 a6 a7 a8"
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = spark.createDataFrame(
        [(1, f"{a} {BOILER} {b}"), (2, BOILER)], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in line_dedup(df).collect()}
    assert rows[1].clean_text == f"{a} {b}"  # middle chunk cut, order kept


def test_bigram_lm_scores(spark):
    common = "the cat sat on the mat"
    df = spark.createDataFrame(
        [(i, common) for i in range(5)] + [(99, "zx qv wk jn pb tg")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in bigram_lm_scores(df).collect()}
    # the repeated doc's bigrams are near-deterministic: 'the' continues
    # to 'cat' 5/10 times and 'mat' 5/10 times, everything else p=1
    expected = round(-(3 * math.log(1) + 2 * math.log(0.5)) / 5, 4)
    assert rows[0].nll == expected and rows[0].n_bigrams == 5
    # the one-off doc: every bigram unique, every continuation p=1 → 0
    assert rows[99].nll == 0.0
    # short docs (<2 tokens) produce no rows rather than errors
    short = spark.createDataFrame([(1, "word"), (2, "")], ["doc_id", "text"])
    assert bigram_lm_scores(short).count() == 0


def test_shard_assign_balanced_and_deterministic(spark, sf_dir):
    import __spark_entry__ as m

    q = m.queries()["corpus_shard_assign"]
    rows = q(spark, sf_dir).collect()
    n = len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.shard_offset)
    # balanced within 3x of ideal (hash round-robin on uniform keys)
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) <= 3 * (n // 8 + 1)
    # offsets are dense 1..len per shard (a valid write position)
    for offs in by_shard.values():
        assert sorted(offs) == list(range(1, len(offs) + 1))
    # deterministic across runs
    again = {(r.doc_id, r.shard, r.shard_offset) for r in q(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.shard, r.shard_offset) for r in rows}


def test_embed_outliers_flags_tail(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.queries()["embed_outliers"](spark, sf_dir).collect()
    frac = sum(r.is_outlier for r in rows) / len(rows)
    # the z-score rule flags a minority tail, never everything
    assert 0 < frac < 0.5
    # outliers are strictly farther than at least one inlier of the
    # same label
    from collections import defaultdict
    by_label = defaultdict(list)
    for r in rows:
        by_label[r.label].append(r)
    for label, rs in by_label.items():
        outs = [r.dist for r in rs if r.is_outlier]
        ins = [r.dist for r in rs if not r.is_outlier]
        if outs and ins:
            assert min(outs) > min(ins)


def test_corpus_stats_profile_percentiles(spark, sf_dir):
    import __spark_entry__ as m

    rows = m.queries()["corpus_stats_profile"](spark, sf_dir).collect()
    assert rows and all(r.n_docs > 0 for r in rows)
    for r in rows:
        assert r.p50_chars_x100 <= r.p90_chars_x100 <= r.p99_chars_x100
        assert r.total_chars >= r.n_docs  # non-empty docs
        # exact-integer mean: round-half-up(100*sum/n)
        num, den = 200 * r.total_chars + r.n_docs, 2 * r.n_docs
        assert r.mean_chars_x100 == num // den
        # percentile ×100 brackets the mean's order of magnitude sanely
        assert r.p50_chars_x100 >= 100  # at least one char


def test_domain_of_and_caps(spark):
    from pyspark.sql import functions as F

    from sequin_spark.datapipe.web import domain_caps, domain_of

    df = spark.createDataFrame(
        [(1, "https://www.Heavy.com/a"), (2, "http://heavy.com/b?x=1"),
         (3, "heavy.com/c#f"), (4, "https://tiny.org/only"),
         (5, "https://heavy.com/d"),
         # embedded URL in a query param must NOT become the domain
         (6, "https://heavy.com/r?next=https://evil.com/x"),
         # port / userinfo / both must not create distinct domains
         (7, "https://heavy.com:8080/a"),
         (8, "http://user@heavy.com/b"),
         (9, "https://user:pw@www.heavy.com:443/c"),
         # '@' or ':' later in path/query must not cut the host
         (10, "https://heavy.com/u/@handle"),
         (11, "https://heavy.com/s?t=a:b@c")],
        "doc_id long, url string",
    )
    doms = {r.doc_id: r.d for r in df.select("doc_id", domain_of(F.col("url")).alias("d")).collect()}
    assert doms == {1: "heavy.com", 2: "heavy.com", 3: "heavy.com",
                    4: "tiny.org", 5: "heavy.com", 6: "heavy.com",
                    7: "heavy.com", 8: "heavy.com", 9: "heavy.com",
                    10: "heavy.com", 11: "heavy.com"}

    out = {r.doc_id: r for r in domain_caps(df, max_per_domain=2).collect()}
    # lowest ids win; rank is per-domain
    assert [out[i].keep for i in (1, 2, 3, 5)] == [True, True, False, False]
    assert out[4].keep and out[4].domain_rank == 1
    assert out[3].domain_rank == 3 and out[5].domain_rank == 4
    assert out[6].domain == "heavy.com" and not out[6].keep
