"""Declarative pipeline specs + YAML front-end.

The reference's config surface is a declarative YAML (sequin.yaml) of
databases / sinks / functions with plan/apply semantics
(lib/sequin/transforms/transforms.ex, lib/sequin/yaml_loader.ex,
POST /api/config/{plan,apply}). Our spec carries the same resource
vocabulary mapped onto Spark constructs; ``plan()`` reports what would
be created (validation errors surface here, before any cluster work).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sequin_spark.functions.minipy import validate as minipy_validate
from sequin_spark.functions.routing import ROUTING_SCHEMAS
from sequin_spark.operators.column_filter import OPERATORS
from sequin_spark.operators.source_filter import Source
from sequin_spark.sinks.base import SINK_REGISTRY


@dataclass
class ConsumerSpec:
    """One sink consumer = one standing query (sink_consumer.ex:39-147)."""

    name: str
    sink_type: str = "benchmark"
    sink_config: dict = field(default_factory=dict)
    source: Source | None = None
    actions: list[str] = field(default_factory=lambda: ["insert", "update", "delete"])
    column_filters: list[dict] = field(default_factory=list)
    filter: str | None = None            # MiniPy predicate
    transform: str | None = None         # default | record_only | path:... | MiniPy
    routing_overrides: dict[str, str] = field(default_factory=dict)  # key → MiniPy
    batch_size: int | None = None
    partition_count: int = 8
    max_retry_count: int = 3
    message_grouping: bool = True
    group_cols: list[str] | None = None
    timestamp_format: str = "iso8601"
    max_payload_bytes: int | None = 5 * 1024 * 1024

    def routing_schema(self) -> str:
        """Sinks without a reference routing schema route like the
        benchmark/file sinks — by kafka-style topic."""
        return self.sink_type if self.sink_type in ROUTING_SCHEMAS else "kafka"

    def routing_keys(self) -> list[str]:
        return list(ROUTING_SCHEMAS[self.routing_schema()].keys())

    def validate(self) -> list[str]:
        errs = []
        if self.sink_type not in SINK_REGISTRY:
            errs.append(f"unknown sink type {self.sink_type!r}")
        for f in self.column_filters:
            op = f.get("operator") if isinstance(f, dict) else f.operator
            if op not in OPERATORS:
                errs.append(f"unknown column filter operator {op!r}")
        for label, expr in [("filter", self.filter)] + [
            (f"routing.{k}", v) for k, v in self.routing_overrides.items()
        ]:
            if expr:
                ok, err = minipy_validate(expr)
                if not ok:
                    errs.append(f"{label}: {err}")
        if self.transform and self.transform not in ("default", "record_only") and not self.transform.startswith("path:"):
            ok, err = minipy_validate(self.transform)
            if not ok:
                errs.append(f"transform: {err}")
        if self.timestamp_format not in ("iso8601", "unix_microsecond"):
            errs.append(f"unknown timestamp_format {self.timestamp_format!r}")
        return errs


def spec_from_dict(d: dict) -> ConsumerSpec:
    d = dict(d)
    src = d.pop("source", None)
    source = Source(**src) if isinstance(src, dict) else src
    return ConsumerSpec(source=source, **d)


def load_yaml(text_or_path: str) -> list[ConsumerSpec]:
    """Load a sequin.yaml-style config: {consumers: [{...}, ...]}."""
    import os

    import yaml

    if os.path.exists(text_or_path):
        with open(text_or_path) as f:
            doc = yaml.safe_load(f)
    else:
        doc = yaml.safe_load(text_or_path)
    return [spec_from_dict(c) for c in doc.get("consumers", [])]


def plan(specs: list[ConsumerSpec]) -> dict:
    """Plan/apply split (yaml_loader / POST /api/config/plan): report
    resources + validation errors without touching any cluster state."""
    report = {"consumers": [], "errors": {}}
    for s in specs:
        report["consumers"].append(
            {
                "name": s.name,
                "sink": s.sink_type,
                "routing_keys": s.routing_keys(),
                "batch_size": s.batch_size,
            }
        )
        errs = s.validate()
        if errs:
            report["errors"][s.name] = errs
    return report
