"""Unigram-LM tokenizer training (SentencePiece, Kudo 2018,
arXiv:1804.10959) — the EM-trained counterpart to BPE in tokenizer.py;
together they cover both tokenizer families an LLM data pipeline
trains.

Algorithm (standard unigram LM, plain MLE EM — SentencePiece's
Bayesianified digamma variant is a one-line swap and deliberately not
used so the differential test can pin exact math):

1. seed vocabulary: all substrings (length ≤ ``max_piece_len``) of the
   corpus's distinct words, weighted by word frequency; keep every
   single character (segmentation totality) plus the top multi-char
   substrings by count.
2. EM: E-step computes each piece's expected count under the current
   piece log-probs with forward-backward over every distinct word;
   M-step renormalizes counts into probabilities.
3. prune: after each round, drop the lowest-expected-count multi-char
   pieces on a geometric schedule down to ``vocab_size``.

100 TB shape — the corpus is read ONCE to build the (word, count)
table; everything after runs over that |distinct words|-bounded table:

* the E-step's forward-backward is a dynamic program Catalyst cannot
  express, so it is Arrow-batched ``mapInPandas`` over the WORD table
  (vocabulary-bounded, not corpus-bounded) with the piece log-probs in
  a broadcast dict — the same justified-Python pattern as the gated
  multimodal decoder; the per-iteration reduce is a piece-keyed sum
  collected to the driver, bounded by the seed size (same
  bounded-aggregate contract as k-means centroids / BPE pair tables).
* ``unigram_encode`` Viterbi-segments each DISTINCT word once
  (mapInPandas over the word table), then broadcast-joins the
  (word → n_tokens) result back onto the corpus token stream — the
  corpus-scale side is pure Catalyst (explode + broadcast hash join +
  sum), no Python in the hot path.

Determinism, honestly stated: there is no sampling and ties break
lexicographically, but the E-step's piece-keyed float sum is a Spark
aggregation whose cross-partition merge order is not fixed, so
expected counts are reproducible only to float-merge noise (last-ulp).
That can matter solely at an EXACT prune-boundary tie between two
pieces' counts — everywhere else the (count, piece) sort is stable
under ulp perturbation.  Hence the differential test compares with
tolerance, the persisted-vocab cache stores the artifact rather than
assuming re-training is bit-identical, and the registry entry is
rows-only checked (no DuckDB oracle: forward-backward EM is genuinely
non-SQL-expressible); exact math is pinned by the pure-Python
differential test in tests/test_tokenizer.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import normalized

_NEG_INF = float("-inf")


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n): distinct normalized words with corpus frequencies —
    the one corpus-scale scan (shared shape with tokenizer._word_table).
    """
    return (
        df.select(F.explode(F.split(normalized(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def seed_vocab(words: DataFrame, seed_size: int = 512,
               max_piece_len: int = 6) -> list[tuple[str, float]]:
    """Initial (piece, logprob) list: every single character plus the
    top ``seed_size`` multi-char substrings by frequency-weighted count
    (count desc, piece asc tie-break). Probs start proportional to
    substring counts — the standard seed."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(i, least(length(word), i + {max_piece_len - 1})), "
        "j -> substr(word, i, j - i + 1))))"
    )
    counts = (
        words.select(F.col("n"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )
    # top-N selection happens IN Spark (sort+limit, i.e. a TakeOrdered,
    # no full substring table ever reaches the driver); only the
    # alphabet + seed_size winners are collected
    chars = [(r["piece"], r["cnt"]) for r in
             counts.filter(F.length("piece") == 1).collect()]
    multi = [(r["piece"], r["cnt"]) for r in
             counts.filter(F.length("piece") > 1)
             .orderBy(F.desc("cnt"), F.asc("piece"))
             .limit(seed_size).collect()]
    total = sum(c for _, c in chars) + sum(c for _, c in multi)
    return sorted(
        (p, math.log(c / total)) for p, c in chars + multi)


def _forward_backward(word: str, logp: dict[str, float],
                      max_len: int) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word under the unigram model and
    the word's total log-likelihood (log Z)."""
    n = len(word)
    alpha = [_NEG_INF] * (n + 1)
    alpha[0] = 0.0
    edges: list[tuple[int, int, str, float]] = []
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            edges.append((j, i, piece, lp))
            s = alpha[j] + lp
            if alpha[i] == _NEG_INF:
                alpha[i] = s
            else:
                m = max(alpha[i], s)
                alpha[i] = m + math.log(math.exp(alpha[i] - m)
                                        + math.exp(s - m))
    beta = [_NEG_INF] * (n + 1)
    beta[n] = 0.0
    for j, i, piece, lp in reversed(edges):
        s = beta[i] + lp
        if beta[j] == _NEG_INF:
            beta[j] = s
        else:
            m = max(beta[j], s)
            beta[j] = m + math.log(math.exp(beta[j] - m) + math.exp(s - m))
    z = alpha[n]
    counts: dict[str, float] = {}
    if z == _NEG_INF:  # unsegmentable (chars are always in vocab, so
        return counts, z  # only reachable after over-pruning)
    for j, i, piece, lp in edges:
        post = math.exp(alpha[j] + lp + beta[i] - z)
        counts[piece] = counts.get(piece, 0.0) + post
    return counts, z


def _viterbi(word: str, logp: dict[str, float],
             max_len: int) -> list[str] | None:
    """Max-probability segmentation (ties: prefer the LONGER last piece,
    then lexicographic — deterministic)."""
    n = len(word)
    best = [(_NEG_INF, -1, "")] * (n + 1)
    best[0] = (0.0, -1, "")
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None or best[j][0] == _NEG_INF:
                continue
            s = best[j][0] + lp
            cur = best[i]
            if (s > cur[0]
                    or (s == cur[0] and (len(piece) > len(cur[2])
                                         or (len(piece) == len(cur[2])
                                             and piece < cur[2])))):
                best[i] = (s, j, piece)
    if best[n][0] == _NEG_INF:
        return None
    out: list[str] = []
    i = n
    while i > 0:
        _, j, piece = best[i]
        out.append(piece)
        i = j
    return out[::-1]


def _estep(words: DataFrame, vocab: list[tuple[str, float]],
           max_len: int) -> DataFrame:
    """Distributed E-step: (piece, expected count weighted by word
    frequency) + a '' row carrying the corpus log-likelihood."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast(dict(vocab))

    def gen(pdfs: Iterator) -> Iterator:
        import pandas as pd

        logp = bc.value
        for pdf in pdfs:
            acc: dict[str, float] = {}
            ll = 0.0
            for word, n in zip(pdf["word"], pdf["n"]):
                counts, z = _forward_backward(word, logp, max_len)
                if z != _NEG_INF:
                    ll += float(n) * z
                for p, c in counts.items():
                    acc[p] = acc.get(p, 0.0) + float(n) * c
            acc[""] = ll
            yield pd.DataFrame(
                {"piece": list(acc), "c": [acc[p] for p in acc]})

    return (
        words.mapInPandas(gen, "piece string, c double")
        .groupBy("piece")
        .agg(F.sum("c").alias("c"))
    )


def train_unigram(
    df: DataFrame,
    spark: SparkSession,
    vocab_size: int = 64,
    text_col: str = "text",
    seed_size: int = 512,
    max_piece_len: int = 6,
    n_iters: int = 4,
    prune_frac: float = 0.25,
) -> DataFrame:
    """Train a unigram-LM vocabulary; returns (piece, logprob,
    expected_cnt) sorted by piece.  ``n_iters`` EM rounds, pruning the
    bottom ``prune_frac`` of multi-char pieces each round until
    ``vocab_size`` pieces remain (single chars are never pruned)."""
    words = _word_counts(df, text_col).localCheckpoint()
    vocab = seed_vocab(words, seed_size=seed_size,
                       max_piece_len=max_piece_len)
    exp_counts: dict[str, float] = {}
    for it in range(n_iters):
        rows = _estep(words, vocab, max_piece_len).collect()  # ≤ |vocab|+1
        exp_counts = {r["piece"]: float(r["c"]) for r in rows
                      if r["piece"] != ""}
        # M-step: renormalize (driver math over the sorted bounded list
        # — summation order fixed ⇒ deterministic)
        items = sorted(exp_counts.items())
        total = math.fsum(c for _, c in items)
        # segmentation totality: a single char whose expected count
        # underflows to exactly 0.0 must still survive the M-step
        # (dropping it would silently turn every word containing it
        # into an OOV fallback) — floor it at a tiny positive count
        # instead of filtering it out; multi-char pieces still drop.
        vocab = [(p, math.log((c if c > 0.0 else 1e-12) / total))
                 for p, c in items if c > 0.0 or len(p) == 1]
        # prune: drop lowest-count multi-char pieces, keep chars
        if len(vocab) > vocab_size:
            multi = sorted(
                ((p, exp_counts[p]) for p, _ in vocab if len(p) > 1),
                key=lambda t: (t[1], t[0]))
            n_chars = sum(1 for p, _ in vocab if len(p) == 1)
            target = (max(vocab_size - n_chars,
                          int(len(multi) * (1.0 - prune_frac)))
                      if it < n_iters - 1 else
                      max(0, vocab_size - n_chars))
            drop = {p for p, _ in multi[:max(0, len(multi) - target)]}
            kept = [(p, lp) for p, lp in vocab if p not in drop]
            total2 = math.fsum(math.exp(lp) for _, lp in kept)
            vocab = [(p, lp - math.log(total2)) for p, lp in kept]
    return spark.createDataFrame(
        [(p, lp, round(exp_counts.get(p, 0.0), 6)) for p, lp in vocab],
        "piece string, logprob double, expected_cnt double",
    )


def unigram_encode(
    df: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 6,
) -> DataFrame:
    """Per-document token counts under a trained unigram vocab.

    Viterbi runs ONCE per distinct word (mapInPandas over the bounded
    word table); the corpus-scale side is explode + broadcast hash
    join + sum — pure Catalyst.

    Words the vocab cannot segment (a character never seen in
    training) fall back to their character count — the byte/char
    fallback every production tokenizer applies to OOV input — and are
    surfaced per doc as ``n_oov_words`` so callers can monitor
    coverage instead of silently absorbing it."""
    spark = df.sparkSession
    corpus_words = (
        df.select(F.col(id_col),
                  F.explode(F.split(normalized(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    distinct_words = corpus_words.select("word").distinct()
    bc = spark.sparkContext.broadcast(dict(vocab))

    def gen(pdfs: Iterator) -> Iterator:
        import pandas as pd

        logp = bc.value
        for pdf in pdfs:
            toks, oov = [], []
            for word in pdf["word"]:
                seg = _viterbi(word, logp, max_piece_len)
                toks.append(len(seg) if seg is not None else len(word))
                oov.append(seg is None)
            yield pd.DataFrame({"word": pdf["word"], "n_tokens": toks,
                                "is_oov": oov})

    word_tokens = distinct_words.mapInPandas(
        gen, "word string, n_tokens int, is_oov boolean")
    return (
        corpus_words.join(F.broadcast(word_tokens), "word")
        .groupBy(id_col)
        .agg(F.sum("n_tokens").cast("long").alias("n_unigram_tokens"),
             F.count(F.lit(1)).cast("long").alias("n_words"),
             F.sum(F.col("is_oov").cast("long")).cast("long")
             .alias("n_oov_words"))
    )
