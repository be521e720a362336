"""BPE merge learning (datapipe/tokenizer.py) — differential-tested
against a pure-Python reference implementation of Sennrich-style BPE
(count pairs over the word-frequency dict, merge the argmax, repeat)."""

import re
from collections import Counter

import pytest

from sequin_spark.datapipe.tokenizer import bpe_encode, bpe_learn_merges


def _py_bpe(texts, n_merges):
    """Reference BPE on word frequencies; greedy left-to-right merge,
    tie-break (count desc, 'x|y' string asc) like the Spark side."""
    words = Counter()
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).split(" "):
            if w:
                words[w] += 1
    syms = {w: list(w) for w in words}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, n in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (x, y), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]}|{kv[0][1]}"))
        merges.append((rank, x, y, x + y, cnt))
        for w in syms:
            s, out = syms[w], []
            for tok in s:
                if out and out[-1] == x and tok == y:
                    out[-1] = x + y
                else:
                    out.append(tok)
            syms[w] = out
        words_syms = syms
    return merges, syms


TEXTS = [
    "the cat sat on the mat",
    "the cats sat",
    "a banana and a bandana",
    "low lower lowest low low",
]


def test_bpe_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = [tuple(r) for r in
           bpe_learn_merges(df, spark, n_merges=6).orderBy("rank").collect()]
    want, _ = _py_bpe(TEXTS, 6)
    assert got == want


def test_bpe_greedy_left_to_right(spark):
    """'aaaa' with top pair (a,a) merges to [aa, aa], not overlapping."""
    df = spark.createDataFrame([(0, "aaaa aaaa")], "doc_id long, text string")
    merges = bpe_learn_merges(df, spark, n_merges=2).orderBy("rank").collect()
    assert (merges[0]["x"], merges[0]["y"]) == ("a", "a")
    # second merge works on the merged symbols: (aa, aa)
    assert (merges[1]["x"], merges[1]["y"]) == ("aa", "aa")


def test_bpe_exhaustion_stops_early(spark):
    """Single-char vocabulary has no pairs after... ever — 0 merges."""
    df = spark.createDataFrame([(0, "a b c a b")], "doc_id long, text string")
    assert bpe_learn_merges(df, spark, n_merges=5).count() == 0


def test_bpe_encode_counts(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = [tuple(r) for r in
              bpe_learn_merges(df, spark, n_merges=6).collect()]
    out = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    _, syms = _py_bpe(TEXTS, 6)
    for i, t in enumerate(TEXTS):
        words = [w for w in re.sub(r"\s+", " ", t.lower()).split(" ") if w]
        want_tokens = sum(len(syms[w]) for w in words)
        assert out[i]["n_bpe_tokens"] == want_tokens
        assert out[i]["n_words"] == len(words)
        # merges only ever shrink the symbol stream
        assert out[i]["n_bpe_tokens"] <= sum(len(w) for w in words)


def test_bpe_batched_matches_python_reference_64_merges(spark, sf_dir):
    """Scan batching must be invisible in the result: 64 merges over the
    real documents table equal the sequential pure-Python reference."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    texts = pq.read_table(path, columns=["text"]).column("text").to_pylist()
    df = spark.read.parquet(path)
    got = [tuple(r) for r in
           bpe_learn_merges(df, spark, n_merges=64).orderBy("rank").collect()]
    want, _ = _py_bpe(texts, 64)
    assert got == want
