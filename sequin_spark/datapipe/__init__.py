"""Large-scale training-data pipeline operators.

Beyond the reference's CDC surface (BASELINE.json north star): dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + hyperplane LSH), text analysis
(language-ID, quality scoring, token counting, fingerprinting), and
multimodal binary-column plumbing.

Design rules for 100 TB:
- everything is Catalyst expressions or Arrow-batched pandas; no
  driver-side loops;
- pairwise work is always bucketed first (LSH bands, hyperplane
  buckets, metadata buckets) so the join fan-out is bounded;
- hash functions are md5-based so results are engine-portable
  (DuckDB-oracle-checkable) and stable across runs.
"""

from sequin_spark.datapipe.dedup import (
    exact_dedup,
    minhash_candidate_pairs,
    ngram_jaccard_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from sequin_spark.datapipe.similarity import brute_force_topk, cosine_col, hyperplane_buckets
from sequin_spark.datapipe.text import fingerprint, langid, quality_score, token_counts

__all__ = [
    "exact_dedup",
    "minhash_candidate_pairs",
    "ngram_jaccard_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_pairs",
    "brute_force_topk",
    "cosine_col",
    "hyperplane_buckets",
    "fingerprint",
    "langid",
    "quality_score",
    "token_counts",
]
