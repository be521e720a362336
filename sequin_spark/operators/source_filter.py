"""Source scoping + action filters.

Reference semantics: lib/sequin/consumers/source.ex:44-52 (include/exclude
schemas and table oids; exclude wins; include/exclude of the same axis are
mutually exclusive) and lib/sequin/consumers/consumers.ex:1188-1199
(action filter; `read` events always pass).

These are plain Catalyst predicates → pushed down to the scan
(PushedFilters on parquet/JDBC), which is what makes scoping free at
100 TB: partitions of excluded tables are never read when the event log
is partitioned by table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Source:
    include_schemas: list[str] | None = None
    exclude_schemas: list[str] | None = None
    include_tables: list[str] | None = None
    exclude_tables: list[str] | None = None
    include_table_oids: list[int] | None = None
    exclude_table_oids: list[int] | None = None

    def __post_init__(self):
        if self.include_schemas and self.exclude_schemas:
            raise ValueError("include_schemas and exclude_schemas are mutually exclusive")
        if (self.include_tables or self.include_table_oids) and (
            self.exclude_tables or self.exclude_table_oids
        ):
            raise ValueError("include and exclude table specs are mutually exclusive")

    def predicate(self) -> Column:
        pred = F.lit(True)
        if self.include_schemas:
            pred = pred & F.col("table_schema").isin(self.include_schemas)
        if self.exclude_schemas:
            pred = pred & ~F.col("table_schema").isin(self.exclude_schemas)
        if self.include_tables:
            pred = pred & F.col("table_name").isin(self.include_tables)
        if self.exclude_tables:
            pred = pred & ~F.col("table_name").isin(self.exclude_tables)
        if self.include_table_oids:
            pred = pred & F.col("table_oid").isin(self.include_table_oids)
        if self.exclude_table_oids:
            pred = pred & ~F.col("table_oid").isin(self.exclude_table_oids)
        return pred


def apply_source_filter(df: DataFrame, source: Source) -> DataFrame:
    return df.filter(source.predicate())


def apply_action_filter(df: DataFrame, actions: list[str]) -> DataFrame:
    """`read` (backfill) events always pass — consumers.ex:1188-1199."""
    return df.filter((F.col("action") == "read") | F.col("action").isin(list(actions)))


INTERNAL_SCHEMAS = ("sequin_config", "sequin_streams")


def drop_internal_schemas(df: DataFrame) -> DataFrame:
    """Reject engine-internal schemas — slot_producer/processor.ex:247-251."""
    return df.filter(~F.col("table_schema").isin(*INTERNAL_SCHEMAS))
