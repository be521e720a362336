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


# sink_config keys that to_external redacts unless show_sensitive
# (transforms.ex:46-78 SensitiveValue semantics)
SENSITIVE_KEYS = frozenset(
    {"password", "secret", "token", "api_key", "credentials",
     "aws_secret_access_key", "shared_access_key"}
)


def to_external(spec: ConsumerSpec, show_sensitive: bool = False) -> dict:
    """Export a spec back to its YAML dict form — the reverse of
    ``spec_from_dict`` (transforms.ex:163-199 ``to_external/2`` for
    SinkConsumer). Defaults are omitted so the export is minimal;
    ``spec_from_dict(to_external(s)) == s`` (round-trip law, with
    secrets redacted to '****' unless show_sensitive)."""
    out: dict = {"name": spec.name, "sink_type": spec.sink_type}
    if spec.sink_config:
        out["sink_config"] = {
            k: ("****" if (k.lower() in SENSITIVE_KEYS and not show_sensitive) else v)
            for k, v in spec.sink_config.items()
        }
    if spec.source is not None:
        src = {
            k: v
            for k, v in vars(spec.source).items()
            if v is not None
        }
        if src:
            out["source"] = src
    defaults = ConsumerSpec(name="")
    for key in (
        "actions", "column_filters", "filter", "transform", "routing_overrides",
        "batch_size", "partition_count", "max_retry_count", "message_grouping",
        "group_cols", "timestamp_format", "max_payload_bytes",
    ):
        v = getattr(spec, key)
        if v != getattr(defaults, key):
            out[key] = v
    return out


def export_yaml(specs: list[ConsumerSpec], show_sensitive: bool = False) -> str:
    """Render specs as a loadable sequin.yaml document — YAML out ==
    YAML in (the reference's 1,626-line to_external/from_external layer,
    transforms.ex, collapsed onto our spec vocabulary)."""
    import yaml

    doc = {"consumers": [to_external(s, show_sensitive) for s in specs]}
    return yaml.safe_dump(doc, sort_keys=False)


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
