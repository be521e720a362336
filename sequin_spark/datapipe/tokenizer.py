"""BPE merge learning — derive a byte-pair-encoding merge table from
the corpus (Sennrich et al. 2016, arXiv:1508.07909), the tokenizer-
training step of an LLM data pipeline.

Classic BPE iterates: count adjacent symbol pairs over the word-
frequency table, merge the most frequent pair everywhere, repeat. The
Spark shape per iteration:

* pair counts — one explode over the (distinct-word, count) table and
  a (x,y)-keyed sum: the word table is |vocab| rows (tiny next to the
  corpus; the corpus itself is read ONCE to build it), so iterations
  cost O(vocab), not O(corpus).
* argmax — a 1-row driver collect (count desc, pair asc tie-break),
  the same bounded-scalar pattern as k-means centroids.
* merge — a narrow per-row fold (``aggregate`` HOF) rewriting each
  word's symbol string; no shuffle.

Lineage is truncated every few iterations (localCheckpoint, the
connected-components pattern) so plans stay bounded.

Symbols are kept as a '|'-joined string ("w|o|r|d"); the merge fold
appends ``y`` to an accumulator that ends with symbol ``x`` (boundary-
checked), which is exactly greedy left-to-right BPE: merging (a,a)
over "a|a|a" yields "aa|a". Words are alphanumeric after
normalization, so '|' never collides with symbol content.

Deterministic end-to-end (no sampling, lexicographic tie-breaks) —
the DuckDB oracle replays the same K iterations as a generated CTE
chain with ``list_reduce`` and scalar-subquery argmaxes
(queries_datapipe._sql_bpe_merges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequin_spark.datapipe.dedup import normalized


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n, syms): distinct words with corpus frequencies and the
    initial character-symbol string."""
    words = (
        df.select(F.explode(F.split(normalized(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    chars = F.expr(
        "array_join(transform(sequence(1, length(word)), "
        "i -> substr(word, i, 1)), '|')"
    )
    return words.withColumn("syms", chars)


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency; pair is
    rendered 'x|y' (symbols are '|'-free)."""
    arr = "split(syms, '\\\\|')"
    pairs = F.expr(
        f"CASE WHEN size({arr}) >= 2 THEN "
        f"transform(sequence(1, size({arr}) - 1), "
        f"i -> concat(element_at({arr}, i), '|', element_at({arr}, i + 1))) "
        f"ELSE array() END"
    )
    return (
        words.select(F.col("n"), F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def _merge_expr(x: str, y: str) -> F.Column:
    """Fold the symbol string, replacing every boundary-adjacent (x, y)
    with the merged symbol — greedy left-to-right like reference BPE."""
    def esc(s: str) -> str:
        return s.replace("\\", "\\\\").replace("'", "\\'")

    ex, ey = esc(x), esc(y)
    arr = "split(syms, '\\\\|')"
    return F.expr(
        f"CASE WHEN size({arr}) < 2 THEN syms ELSE "
        f"aggregate(slice({arr}, 2, size({arr}) - 1), element_at({arr}, 1), "
        f"(acc, s) -> CASE WHEN (acc = '{ex}' OR acc LIKE '%|{ex}') "
        f"AND s = '{ey}' THEN concat(acc, '{ey}') "
        f"ELSE concat(acc, '|', s) END) END"
    )


def bpe_learn_merges(
    df: DataFrame,
    spark: SparkSession,
    n_merges: int = 8,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns (rank, x, y, merged, cnt)
    ordered by rank. Stops early if pairs exhaust."""
    words = _word_table(df, text_col).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        pair, cnt = top[0]["pair"], int(top[0]["cnt"])
        x, _, y = pair.partition("|")
        merges.append((rank, x, y, x + y, cnt))
        words = words.withColumn("syms", _merge_expr(x, y))
        if rank % checkpoint_every == 0:
            words = words.localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, x string, y string, merged string, cnt long"
    )


def bpe_encode(df: DataFrame, merges: list[tuple], text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Token counts under a learned merge table: apply the merges in
    rank order to every word, count resulting symbols per document.
    ``merges``: [(rank, x, y, merged, cnt), ...] from bpe_learn_merges.
    """
    out = df.select(
        F.col(id_col), F.explode(F.split(normalized(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    chars = F.expr(
        "array_join(transform(sequence(1, length(word)), "
        "i -> substr(word, i, 1)), '|')"
    )
    out = out.withColumn("syms", chars)
    for _, x, y, _, _ in sorted(merges):
        out = out.withColumn("syms", _merge_expr(x, y))
    n_syms = F.size(F.expr("split(syms, '\\\\|')"))
    return out.groupBy(id_col).agg(
        F.sum(n_syms).cast("long").alias("n_bpe_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_words"),
    )
