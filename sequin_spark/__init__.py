"""sequin_spark — a PySpark-native CDC/stream-processing engine.

A brand-new engine with the query and data-processing capabilities of
sequinstream/sequin (reference surveyed in SURVEY.md), re-expressed on the
Spark DataFrame / Structured Streaming stack:

- Canonical change-event schema (``sequin_spark.schema``) mirroring the
  reference's ConsumerEventData payload.
- Postgres text-value casting rules (``sequin_spark.types``).
- Declarative operators (``sequin_spark.operators``): source scoping,
  column filters, diff/changes, grouping & ordered delivery, dedup,
  payload guards — all plain Catalyst expressions so predicate pushdown,
  column pruning and whole-stage codegen apply.
- Function surface (``sequin_spark.functions``): path projections, a
  sandboxed expression DSL compiled to Spark SQL, per-sink routing.
- Sources & backfill (``sequin_spark.sources``), sinks (``sequin_spark.sinks``),
  and the streaming pipeline compiler (``sequin_spark.streaming``).
- Large-scale training-data operators (``sequin_spark.datapipe``):
  dedup (exact/MinHash-LSH/SimHash/n-gram), similarity search, text
  analysis, multimodal column plumbing.

Everything is designed for a 1000-executor cluster: broadcast joins for
dims, group-hash partitioning for ordered delivery, no driver-side
per-row work.
"""

__version__ = "0.1.0"

from sequin_spark.session import get_spark  # noqa: F401
