"""Text analysis operators: language-ID, quality scoring, token
counting, fingerprinting. All pure Catalyst expressions (regex + string
built-ins), no UDFs — at 100 TB these run at scan speed with column
pruning (only `text` is read)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sequin_spark.plan_capture import ckpt as _plan_ckpt

from sequin_spark.datapipe.dedup import normalized, spread_for_compute

# n-gram-heuristic stopword inventories (tiny but deterministic;
# production would load real per-language frequency tables)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "de", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}


def _hits(lang: str) -> F.Column:
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(normalized("text"), F.lit(pat), F.lit(0)))


def langid(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Language-ID by stopword-hit voting; 'und' when nothing matches.

    Deterministic tie-break: highest count wins, then alphabetical
    language code.
    """
    out = df.select(F.col(id_col), F.col("text"))
    for lang in STOPWORDS:
        out = out.withColumn(f"hits_{lang}", _hits(lang))
    best = None
    for lang in sorted(STOPWORDS):
        cand = F.col(f"hits_{lang}")
        if best is None:
            best, best_lang = cand, F.lit(lang)
        else:
            cond = cand > best
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best = F.when(cond, cand).otherwise(best)
    pred = F.when(best > 0, best_lang).otherwise(F.lit("und"))
    return out.withColumn("predicted_lang", pred).drop("text")


def token_counts(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens, BPE-ish regex tokens, and a bytes/4 estimate
    (the common "1 token ≈ 4 chars" heuristic)."""
    norm = normalized("text")
    return df.select(
        F.col(id_col),
        F.length(norm).alias("n_chars_norm"),
        F.size(F.split(norm, " ")).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(norm, F.lit(r"[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))
        ).alias("n_re_tokens"),
        F.ceil(F.length(norm) / 4.0).cast("long").alias("n_bpe_est"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id",
                  carry: tuple = ()) -> DataFrame:
    """Heuristic quality scoring: length, token stats, stopword density,
    digit/punct noise → score in [0,1] + keep flag (the shape of a
    C4/Gopher-style quality filter).

    ``carry`` names extra input columns to pass through unchanged, so a
    downstream filter on ``keep`` doesn't need a join back to the source
    to recover them (one scan instead of scan + semi-join)."""
    norm = normalized("text")
    n_chars = F.length(norm)
    n_tokens = F.size(F.split(norm, " "))
    n_digits = F.size(F.regexp_extract_all(norm, F.lit(r"[0-9]"), F.lit(0)))
    stop_hits = F.size(
        F.regexp_extract_all(norm, F.lit(r"\b(the|a|of|and|in|to)\b"), F.lit(0))
    )
    avg_tok_len = (n_chars - (n_tokens - 1)) / n_tokens
    stop_ratio = stop_hits / n_tokens
    digit_ratio = n_digits / n_chars
    score = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (F.lit(0.5) + F.lit(0.5) * stop_ratio)
        - digit_ratio,
        4,
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_norm"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        score.alias("quality"),
        ((n_chars >= 50) & (n_tokens >= 10) & (score > 0.1)).alias("keep"),
        *[F.col(c) for c in carry],
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", gram: int = 8) -> DataFrame:
    """Document fingerprint: content md5 + min character-gram hash
    (winnowing-style rolling fingerprint, portable md5 arithmetic)."""
    # spread FIRST, normalize AFTER: projecting normalized(text)
    # before the repartition would run the regex normalization (the
    # cost the spread exists to parallelize) on the narrow byte-sized
    # scan partitions — match the simhash/shingle/chunk/bigram kernels
    out = spread_for_compute(df.select(F.col(id_col), "text"))
    out = out.select(F.col(id_col), normalized("text").alias("t"))
    # fold-min, NOT array_min(transform(...)): the transform form
    # materializes a full array of 32-char md5 strings per row
    # (~433 per avg doc) before taking the min — at the sf100 decade
    # that allocation pattern measured 44× wall for 11× chars (GC
    # pressure; r11 third-decade find).  aggregate() folds the same
    # md5 sequence through one running min — identical values, no
    # per-row array.
    out = out.withColumn(
        "min_gram_hash",
        F.expr(
            f"aggregate(sequence(1, greatest(1, length(t) - {gram - 1})), "
            f"CAST(NULL AS STRING), "
            f"(acc, i) -> least(acc, md5(substr(t, i, {gram}))), "
            f"acc -> acc)"
        ),
    )
    return out.select(
        F.col(id_col),
        F.md5(F.col("t")).alias("content_md5"),
        F.col("min_gram_hash"),
    )


# ---------------------------------------------------------------------------
# count-based bigram LM scoring (the KenLM-perplexity quality filter of
# CCNet/RedPajama pipelines, re-expressed as corpus-relative n-gram
# statistics — no external model file needed)


def doc_bigrams(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(id, w1, w2) for every adjacent token pair — narrow explode.

    The token array is materialized as a projection step FIRST: inlining
    the split(normalize(...)) expression into the pair lambda would
    re-tokenize the whole document on every element access — O(words²)
    regex work per doc (measured 7× on the bench corpus)."""
    words = F.col("_w")
    src = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    d = src.select(F.col(id_col), F.split(normalized(text_col), " ").alias("_w"))
    pairs = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.struct(
                F.element_at(words, i).alias("w1"),
                F.element_at(words, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return d.select(
        F.col(id_col), F.explode(pairs).alias("bg")
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))


def _bigram_hash(w1, w2) -> F.Column:
    """64-bit keyed hash of a bigram — the narrow join/broadcast key
    the LM scoring passes use instead of the two word strings (verdict
    r13 task #5: provable key narrowing).  Tests monkeypatch this with
    a deliberately weak hash to prove the collision guard fires."""
    return F.xxhash64(w1, w2)


def hash_keyed_terms(terms: DataFrame, value_col: str,
                     w1: str = "w1", w2: str = "w2") -> DataFrame:
    """(_h2, value) probe table keyed by the 64-bit bigram hash, with an
    IN-PLAN collision guard: the number of distinct bigrams per hash is
    counted in the same vocab-bounded aggregate, and any hash owning
    more than one bigram raises instead of silently merging their
    terms.  ``terms`` must carry one row per (w1, w2).  The guard rides
    the value expression (a dead assert column would be pruned), so it
    is evaluated exactly where the narrowing is trusted."""
    return (
        terms.select(_bigram_hash(w1, w2).alias("_h2"),
                     F.col(value_col))
        .groupBy("_h2")
        .agg(F.count("*").alias("_n"), F.min(value_col).alias(value_col))
        .select(
            "_h2",
            F.when(F.col("_n") == 1, F.col(value_col)).otherwise(
                F.expr("CAST(raise_error('bigram 64-bit hash collision: "
                       "widen the LM join key') AS DOUBLE)")
            ).alias(value_col),
        )
    )


def bigram_lm_scores(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    bigram LM: nll(doc) = avg over bigrams of -ln(c(w1,w2) / c(w1·)).

    Low nll = phrasing that matches corpus statistics; high nll = noise,
    boilerplate, or out-of-domain text (the CCNet perplexity gate).

    Scale shape: the LM *is* two aggregations over the corpus —
    vocabulary-bounded count tables (unigram continuations c(w1·) and
    bigrams c(w1,w2)), then one hash join of the exploded doc bigrams
    against them and a doc-keyed mean. The count tables grow with the
    vocabulary, not the corpus, so at 100 TB they stay join-small and
    AQE broadcasts the unigram side; no driver-side state.

    Returns (id, n_bigrams, nll) with nll rounded to 4 decimals (floating
    summation order tolerance).
    """
    # the exploded bigram stream is scanned twice (counts, then scoring);
    # persist it so the tokenize/explode work runs once — at cluster
    # scale this is the standard cached/checkpointed intermediate of any
    # two-pass statistic
    bg = doc_bigrams(df, text_col, id_col).persist()
    # ONE corpus-scale aggregate on (w1, w2) — r14 (verdict task #5
    # family): the old rollup expanded every bigram row into TWO
    # grouping sets before the partial agg, so the map side processed
    # (and the exchange carried) both levels; the unigram continuation
    # table c(w1·) = Σ_w2 c(w1,w2) derives EXACTLY from the bigram
    # table by a second, vocab-bounded aggregate instead — identical
    # integer counts, half the corpus-scale aggregate input.
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))
    # fold into ONE per-bigram term table (vocab-bounded, AQE broadcasts
    # it), so the corpus-scale stream is joined once, not twice
    terms = c2.join(c1, "w1").select(
        "w1", "w2", (-F.log(F.col("c2") / F.col("c1"))).alias("nll_term")
    )
    # the probe side is keyed by a 64-bit hash of the bigram instead of
    # the two word strings (narrower broadcast/shuffle key); the guard
    # aggregate proves injectivity on THIS corpus and raises loudly on
    # a collision instead of silently merging two bigrams' terms
    terms_h = hash_keyed_terms(terms, "nll_term")
    out = (
        bg.select(id_col, _bigram_hash("w1", "w2").alias("_h2"))
        .join(terms_h, "_h2")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("nll_term"), 4).alias("nll"),
        )
    )
    # materialize the (doc-keyed, small) result while the bigram cache is
    # live, then release it — composed pipelines would otherwise
    # accumulate cached blocks for the session's lifetime
    out = _plan_ckpt(out, eager=True)
    bg.unpersist()
    return out


def perplexity_buckets(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """CCNet-style head/middle/tail bucketing by corpus-LM score: the
    nll tercile thresholds split the corpus into head (best-matching
    third), middle, and tail (noisiest third). CCNet trains on head,
    samples middle, drops/weights tail — the bucket label is the knob
    downstream mixing consumes.

    The thresholds are exact percentiles of the per-doc nll — TWO
    doubles, computed by one aggregate and embedded as literals
    (bounded driver value, same class as a k-means centroid). Bucket
    comparison against 4-dp-rounded nll values is ulp-robust: a
    threshold interpolated strictly between two distinct rounded values
    can't equal any doc's nll, and one landing on a value is exact in
    any IEEE engine.

    Returns (id, n_bigrams, nll, bucket).
    """
    scores = bigram_lm_scores(df, text_col, id_col)
    t1, t2 = scores.agg(
        F.expr("percentile(nll, array(1.0D/3, 2.0D/3))").alias("t")
    ).head()["t"]
    return scores.select(
        id_col,
        "n_bigrams",
        "nll",
        F.when(F.col("nll") <= F.lit(t1), F.lit("head"))
        .when(F.col("nll") <= F.lit(t2), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def readability(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease profile: sentence count (runs of [.!?]),
    word count, and a vowel-group syllable proxy (the classic
    hyphenation-free approximation), then

        flesch = 206.835 - 1.015*(words/sentences)
                         - 84.6*(syllables/words)

    rounded to 2.  All three counts are regexp_extract_all sizes over
    the text — one narrow scan, no shuffle; the same counting runs in
    the DuckDB oracle (RE2 and Java regex agree on these character-
    class patterns).  Bands follow the published Flesch scale."""
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1))
    words = F.greatest(
        F.size(F.split(normalized("text"), " ")), F.lit(1))
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit("[aeiouy]+"), F.lit(0))),
        F.lit(1))
    # Exact integer rational: flesch = num / (1000*s*w) with
    #   num = 206835*s*w - 1015*w^2 - 84600*y*s   (clamped at 0 — the
    # practical floor of the published scale, and it keeps every
    # integer division positive so Spark's truncating `div` and
    # DuckDB's flooring `//` agree).  Rounding to hundredths is then
    # (200*num + den) div (2*den) — pure integer half-up, immune to
    # the float round-boundary ulp flip a naive round(x, 2) hits.
    base = df.select(
        F.col(id_col),
        sentences.cast("long").alias("n_sentences"),
        words.cast("long").alias("n_words"),
        syllables.cast("long").alias("n_syllables"),
    )
    num = F.greatest(
        F.lit(0).cast("long"),
        (F.lit(206835) * F.col("n_sentences") * F.col("n_words")
         - F.lit(1015) * F.col("n_words") * F.col("n_words")
         - F.lit(84600) * F.col("n_syllables") * F.col("n_sentences"))
        .cast("long"))
    den = (F.lit(1000) * F.col("n_sentences") * F.col("n_words")).cast("long")
    base = (base.withColumn("_num", num)
            .withColumn("_den", den)
            .withColumn("_h", F.expr("(200 * _num + _den) div (2 * _den)")
                        .cast("long")))
    return base.select(
        F.col(id_col),
        "n_sentences", "n_words", "n_syllables",
        (F.col("_h") / F.lit(100.0)).alias("flesch"),
        F.when(F.col("_h") >= 6000, "easy")
        .when(F.col("_h") >= 3000, "medium")
        .otherwise("hard").alias("band"),
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Character-distribution Shannon entropy per document (nats,
    rounded 4) — the gibberish/noise signal: natural language sits in
    a narrow band, base64/hex blobs and repeated mash fall outside it.
    One codepoint explode (regexp '.') over the NORMALIZED text with
    spaces dropped, a (doc, char) count shuffle, then entropy =
    -Σ (c/n)·ln(c/n) folded from integer counts (round-4).

    Order-stabilized: a plain float SUM accumulates in partition order,
    and a last-ulp difference at a round-4 boundary can flip a row
    against the oracle (the exact hazard that bit readability's
    round-2 in r8) — so the per-doc terms are collected, array_sort'ed,
    and folded left-to-right; both engines sum the identical sorted
    float list, giving a bit-identical total."""
    from pyspark.sql import Window

    # NOTE deliberately NOT spread: measured twice (r13 under load, r14
    # idle same-process A/B min 1.17 vs 1.28 s) — the per-(doc,char)
    # partial aggregation collapses the explode inside the scan task,
    # so a pre-exchange only adds shuffle bytes
    chars = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(
            normalized("text"), F.lit("."), F.lit(0))).alias("ch"),
    ).filter(F.col("ch") != " ")
    per = (
        chars.groupBy(id_col, "ch")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .withColumn("n", F.sum("c").over(Window.partitionBy(id_col)))
    )
    terms = per.groupBy(id_col).agg(
        F.max("n").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.array_sort(F.collect_list(
            (F.col("c") / F.col("n"))
            * F.log(F.col("c") / F.col("n")))).alias("_terms"),
    )
    return terms.select(
        id_col, "n_chars", "n_distinct_chars",
        F.round(-F.aggregate("_terms", F.lit(0.0),
                             lambda acc, x: acc + x), 4).alias("entropy"),
    )
