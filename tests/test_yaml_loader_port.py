"""Ports from the reference's YAML config-surface corpus
(test/sequin/yaml_loader_test.exs, 2,661 LoC — the largest reference
test file).  The full family map with per-family verdicts lives in
COVERAGE.md ("Residue: yaml_loader_test.exs"); these are the scenario
ports that closed real gaps: the initial_backfill creation directive
(yaml_loader_test.exs:2407-2643), the message_grouping/group_columns
contradiction (:1169), apply-twice idempotency (:173,:475,:870), YAML
anchors (:1596,:1724), and cleared function keys (:737)."""

import time

import pytest

from sequin_spark.operators.source_filter import Source
from sequin_spark.plans.backfill_api import BackfillManager
from sequin_spark.plans.config_api import ConfigRegistry
from sequin_spark.plans.spec import ConsumerSpec, load_config


@pytest.fixture()
def tables(spark):
    """Two resolvable snapshot tables (customer 500 rows, orders 200)."""
    cust = (spark.range(500)
            .selectExpr("id AS c_custkey", "concat('n-', id) AS c_name")
            .cache())
    orders = (spark.range(200)
              .selectExpr("id AS o_orderkey", "id * 7 AS o_total")
              .cache())
    cust.count(), orders.count()

    def resolver(ref):
        if ref == "public.customer":
            return cust, ["c_custkey"]
        if ref == "public.orders":
            return orders, ["o_orderkey"]
        raise KeyError(ref)

    yield resolver
    cust.unpersist(), orders.unpersist()


def _registry(resolver) -> ConfigRegistry:
    return ConfigRegistry(
        backfills=BackfillManager(resolver, initial_page_size=200))


def _wait_done(mgr: BackfillManager, sink: str, n: int, timeout=60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        jobs = mgr.list_for_sink(sink)
        if len(jobs) >= n and all(j.state == "completed" for j in jobs):
            return jobs
        time.sleep(0.05)
    raise AssertionError(
        f"{sink}: wanted {n} completed backfills, have "
        f"{[(j.table_ref, j.state) for j in mgr.list_for_sink(sink)]}")


def test_initial_backfill_true_backfills_single_source_table(tables):
    """yaml_loader_test.exs:2422 — ``initial_backfill: true`` on sink
    creation starts one backfill over the sink's single source table."""
    reg = _registry(tables)
    out = reg.apply([ConsumerSpec(
        name="s1", sink_type="benchmark",
        source=Source(include_tables=["public.customer"]),
        initial_backfill=True)])
    assert "errors" not in out
    (job,) = _wait_done(reg.backfills, "s1", 1)
    assert job.table_ref == "public.customer"
    assert job.to_external()["rows_processed_count"] == 500


def test_initial_backfill_false_or_omitted_creates_none(tables):
    """yaml_loader_test.exs:2447,2469 — false and the default both
    create nothing."""
    reg = _registry(tables)
    reg.apply([
        ConsumerSpec(name="s-false", sink_type="benchmark",
                     source=Source(include_tables=["public.customer"]),
                     initial_backfill=False),
        ConsumerSpec(name="s-omit", sink_type="benchmark",
                     source=Source(include_tables=["public.customer"])),
    ])
    assert reg.backfills.list_for_sink("s-false") == []
    assert reg.backfills.list_for_sink("s-omit") == []


def test_initial_backfill_list_creates_one_per_table(tables):
    """yaml_loader_test.exs:2490 — the list form backfills each entry."""
    reg = _registry(tables)
    out = reg.apply([ConsumerSpec(
        name="s2", sink_type="benchmark",
        initial_backfill=[{"table": "public.customer"},
                          {"table": "public.orders"}])])
    assert "errors" not in out
    jobs = _wait_done(reg.backfills, "s2", 2)
    assert {j.table_ref for j in jobs} == {"public.customer",
                                          "public.orders"}


def test_initial_backfill_only_on_creation_not_update(tables):
    """yaml_loader_test.exs:2519 — re-applying (even with a changed
    spec) never starts another backfill for an existing sink."""
    reg = _registry(tables)
    spec = ConsumerSpec(
        name="s3", sink_type="benchmark",
        source=Source(include_tables=["public.customer"]),
        initial_backfill=True)
    reg.apply([spec])
    _wait_done(reg.backfills, "s3", 1)
    # identical re-apply: plan says unchanged (the directive is
    # excluded from spec equality), and no second job appears
    plan = reg.plan([spec])
    assert [c["action"] for c in plan["changes"]] == ["unchanged"]
    reg.apply([spec])
    # a real update (batch_size) with the directive still present
    from dataclasses import replace

    reg.apply([replace(spec, batch_size=77)])
    assert len(reg.backfills.list_for_sink("s3")) == 1


def test_initial_backfill_invalid_table_fails_apply_atomically(tables):
    """yaml_loader_test.exs:2564 — an unresolvable table fails the
    apply; validate-all-then-commit means the OTHER valid sink in the
    same document is not created either."""
    reg = _registry(tables)
    out = reg.apply([
        ConsumerSpec(name="bad", sink_type="benchmark",
                     initial_backfill=[{"table": "public.nope"}]),
        ConsumerSpec(name="good", sink_type="benchmark"),
    ])
    assert out["errors"]["bad"] == ["Table public.nope not found"]
    assert reg.consumers == {}
    assert reg.backfills.list_for_sink("bad") == []


def test_initial_backfill_partial_shape_validation():
    """yaml_loader_test.exs:2603,2623,2643 — partial backfills need
    BOTH sort_column and start_position; list entries need a table."""
    base = dict(name="s", sink_type="benchmark")
    no_sort = ConsumerSpec(
        **base, initial_backfill=[{"table": "t", "start_position": 5}])
    assert any("requires sort_column" in e for e in no_sort.validate())
    no_start = ConsumerSpec(
        **base, initial_backfill=[{"table": "t", "sort_column": "c"}])
    assert any("requires start_position" in e for e in no_start.validate())
    no_table = ConsumerSpec(
        **base, initial_backfill=[{"sort_column": "c"}])
    assert any("requires a `table` field" in e for e in no_table.validate())
    ok = ConsumerSpec(
        **base, initial_backfill=[
            {"table": "t", "sort_column": "c", "start_position": 5}])
    assert ok.validate() == []


def test_initial_backfill_partial_invalid_sort_column_errors(tables):
    """yaml_loader_test.exs:2582 — a sort_column the table lacks is
    rejected before any job starts."""
    reg = _registry(tables)
    out = reg.apply([ConsumerSpec(
        name="s4", sink_type="benchmark",
        initial_backfill=[{"table": "public.customer",
                           "sort_column": "no_such_col",
                           "start_position": 0}])])
    assert out["errors"]["s4"] == [
        "Column no_such_col not found on table public.customer"]
    assert reg.backfills.list_for_sink("s4") == []


def test_initial_backfill_partial_starts_after_position(tables):
    """Partial backfill pages keyset over sort_column strictly after
    start_position — only the tail of the table snapshots."""
    reg = _registry(tables)
    reg.apply([ConsumerSpec(
        name="s5", sink_type="benchmark",
        initial_backfill=[{"table": "public.customer",
                           "sort_column": "c_custkey",
                           "start_position": 399}])])
    (job,) = _wait_done(reg.backfills, "s5", 1)
    assert job.to_external()["rows_processed_count"] == 100
    assert job.to_external()["sort_column"] == "c_custkey"


def test_message_grouping_false_with_group_cols_rejected():
    """yaml_loader_test.exs:1169 — grouping columns on an ungrouped
    sink are a contradiction, not a silent no-op."""
    spec = ConsumerSpec(name="s", sink_type="benchmark",
                        message_grouping=False, group_cols=["region"])
    assert spec.validate() == [
        "Cannot specify group_column_names when message_grouping is false"]
    ok = ConsumerSpec(name="s", sink_type="benchmark",
                      message_grouping=True, group_cols=["region"])
    assert ok.validate() == []


def test_apply_yaml_twice_no_duplicates(tables):
    """yaml_loader_test.exs:173,475,870 — the same document applied
    twice leaves one of everything (including the creation-time
    backfill) and plans as all-unchanged."""
    doc = """
functions:
  - name: scrub
    type: transform
    code: 'record["c_name"]'
consumers:
  - name: customers-sink
    sink_type: benchmark
    source:
      include_tables: [public.customer]
    transform: scrub
    initial_backfill: true
"""
    fns, specs = load_config(doc)
    reg = _registry(tables)
    assert "errors" not in reg.apply(specs, functions=fns)
    _wait_done(reg.backfills, "customers-sink", 1)
    fns2, specs2 = load_config(doc)
    assert "errors" not in reg.apply(specs2, functions=fns2)
    assert len(reg.consumers) == 1 and len(reg.functions) == 1
    assert len(reg.backfills.list_for_sink("customers-sink")) == 1
    plan = reg.plan(specs2, functions=fns2)
    assert {c["action"] for c in plan["changes"]} == {"unchanged"}


def test_yaml_anchors_create_multiple_sinks():
    """yaml_loader_test.exs:1596,1724 — anchor/merge YAML expands into
    distinct consumers with their overrides applied."""
    doc = """
consumers:
  - &base
    name: sink-a
    sink_type: benchmark
    batch_size: 10
  - <<: *base
    name: sink-b
    batch_size: 20
"""
    _, specs = load_config(doc)
    reg = ConfigRegistry()
    assert "errors" not in reg.apply(specs)
    assert set(reg.consumers) == {"sink-a", "sink-b"}
    assert reg.consumers["sink-a"].batch_size == 10
    assert reg.consumers["sink-b"].batch_size == 20


def test_removing_function_keys_clears_them(tables):
    """yaml_loader_test.exs:737 — re-applying a sink without its
    transform/filter keys detaches the functions (wholesale replace,
    not merge)."""
    reg = _registry(tables)
    from sequin_spark.plans.spec import FunctionSpec

    fns = [FunctionSpec(name="scrub", type="transform",
                        code='record["c_name"]'),
           FunctionSpec(name="only-big", type="filter",
                        code='record["c_custkey"] > 10')]
    with_fns = ConsumerSpec(name="s6", sink_type="benchmark",
                            transform="scrub", filter="only-big")
    assert "errors" not in reg.apply([with_fns], functions=fns)
    resolved = reg.resolved_consumer("s6")
    assert resolved.transform == 'record["c_name"]'
    without = ConsumerSpec(name="s6", sink_type="benchmark")
    assert "errors" not in reg.apply([without], functions=fns)
    resolved = reg.resolved_consumer("s6")
    assert resolved.transform is None and resolved.filter is None
