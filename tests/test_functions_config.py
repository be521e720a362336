"""Named-function resources in YAML config (yaml_loader.ex:1051-1180
upsert_functions/coerce_function_attrs, transforms.ex:903-931 consumers
referencing functions by name, :1368-1375 parse_function_id)."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry
from sequin_spark.plans.spec import (
    ConsumerSpec,
    FunctionSpec,
    function_from_dict,
    load_config,
    resolve_consumer,
)


# -- parsing (coerce_function_attrs forms) ----------------------------------

def test_function_from_dict_flat_and_nested():
    flat = function_from_dict(
        {"name": "f1", "type": "filter", "code": "record['n'] > 1"})
    assert flat == FunctionSpec(name="f1", type="filter",
                                code="record['n'] > 1")
    nested = function_from_dict(
        {"name": "f2", "function": {"type": "transform",
                                    "code": "record['n']"}})
    assert nested.type == "transform" and nested.code == "record['n']"
    # legacy nested key `transform` + legacy type `function` → transform
    legacy = function_from_dict(
        {"name": "f3", "transform": {"type": "function",
                                     "code": "record['n']"}})
    assert legacy.type == "transform"


def test_function_from_dict_rejects_file_and_both_keys():
    with pytest.raises(ValueError, match="file"):
        function_from_dict({"name": "x", "file": "t.py"})
    with pytest.raises(ValueError, match="both"):
        function_from_dict({"name": "x", "function": {}, "transform": {}})


def test_load_config_functions_section_and_alias():
    fns, consumers = load_config(
        "functions:\n"
        "  - {name: up, type: transform, code: \"record['n'] + 1\"}\n"
        "consumers:\n"
        "  - {name: c1, sink_type: benchmark, transform: up}\n"
    )
    assert [f.name for f in fns] == ["up"] and consumers[0].transform == "up"
    # legacy `transforms:` alias
    fns2, _ = load_config(
        "transforms:\n"
        "  - {name: t, type: transform, code: 'record'}\n")
    assert fns2[0].name == "t"
    with pytest.raises(ValueError, match="both"):
        load_config("functions: []\ntransforms: []\n")


# -- validation (function types + $1 rule) ----------------------------------

def test_function_validation(spark):
    assert FunctionSpec(name="", code="record").validate()
    assert FunctionSpec(name="x", type="nope").validate()
    assert not FunctionSpec(name="x", type="filter",
                            code="record['a'] == 1").validate()
    # enrichment must be $1-parameterized (yaml_loader.ex:1164-1180)
    bad = FunctionSpec(name="e", type="enrichment",
                       code="SELECT * FROM accounts")
    assert any("$1" in e for e in bad.validate())
    good = FunctionSpec(
        name="e", type="enrichment",
        code="SELECT id, plan FROM accounts WHERE id = ANY($1)")
    assert not good.validate()


# -- registry plan/apply with references ------------------------------------

REGISTRY_YAML = """
functions:
  - name: big-orders
    type: filter
    code: "record['o_totalprice'] > 1000"
  - name: flatten
    type: path
    code: "record.o_custkey"
consumers:
  - name: orders-sink
    sink_type: benchmark
    filter: big-orders
    transform: flatten
"""


def test_registry_apply_and_resolve(spark):
    reg = ConfigRegistry()
    fns, specs = load_config(REGISTRY_YAML)
    result = reg.apply(specs, fns)
    assert "errors" not in result
    kinds = {(r["resource"], r["name"]) for r in result["resources"]}
    assert ("function", "big-orders") in kinds
    assert ("sink_consumer", "orders-sink") in kinds
    # runtime resolution: names replaced by code (transforms.ex *_id join)
    resolved = reg.resolved_consumer("orders-sink")
    assert resolved.filter == "record['o_totalprice'] > 1000"
    assert resolved.transform == "path:record.o_custkey"
    # the stored spec keeps the reference form
    assert reg.consumers["orders-sink"].filter == "big-orders"


def test_registry_missing_function_reference_rejected(spark):
    reg = ConfigRegistry()
    _, specs = load_config(
        "consumers:\n"
        "  - {name: c, sink_type: benchmark, filter: no-such-fn}\n")
    result = reg.apply(specs, [])
    assert "Function 'no-such-fn' not found." in result["errors"]["c"]
    # plan reports the same error without committing
    plan = reg.plan(specs, [])
    assert "Function 'no-such-fn' not found." in plan["errors"]["c"]
    assert reg.consumers == {}


def test_registry_reference_type_mismatch_rejected(spark):
    reg = ConfigRegistry()
    fns, specs = load_config(
        "functions:\n"
        "  - {name: r, type: routing, code: \"record['id']\"}\n"
        "consumers:\n"
        "  - {name: c, sink_type: benchmark, filter: r}\n")
    result = reg.apply(specs, fns)
    assert any("type" in e for e in result["errors"]["c"])


def test_resolve_none_clears_fields():
    spec = ConsumerSpec(name="c", filter="none", transform="none")
    resolved = resolve_consumer(spec, {})
    assert resolved.filter is None and resolved.transform is None


def test_pipeline_rejects_unresolved_references(spark):
    """A bare function name reaching ConsumerPipeline would compile as
    a column reference — the constructor must refuse it."""
    from sequin_spark.streaming.pipeline import ConsumerPipeline

    spec = ConsumerSpec(name="c", sink_type="benchmark",
                        filter="my-filter-fn")
    with pytest.raises(ValueError, match="resolve"):
        ConsumerPipeline(spec)
    # resolved specs construct fine
    reg = ConfigRegistry()
    fns, specs = load_config(REGISTRY_YAML)
    reg.apply(specs, fns)
    ConsumerPipeline(reg.resolved_consumer("orders-sink"))


def test_plan_function_diff_actions(spark):
    reg = ConfigRegistry()
    fns, specs = load_config(REGISTRY_YAML)
    reg.apply(specs, fns)
    # re-plan same doc: all unchanged
    plan = reg.plan(specs, fns)
    assert all(c["action"] == "unchanged" for c in plan["changes"])
    # change a function body → update; drop the other → delete
    fns2 = [FunctionSpec(name="big-orders", type="filter",
                         code="record['o_totalprice'] > 2000")]
    specs2 = [s for s in specs]
    plan2 = reg.plan(specs2, fns2)
    actions = {(c["resource"], c["name"]): c["action"]
               for c in plan2["changes"]}
    assert actions[("function", "big-orders")] == "update"
    assert actions[("function", "flatten")] == "delete"
    # consumer still references the dropped function → plan error
    assert any("flatten" in e for e in plan2["errors"]["orders-sink"])


# -- REST e2e over the config API -------------------------------------------

def _post_yaml(url, yaml_text):
    req = urllib.request.Request(
        url, data=yaml_text.encode(),
        headers={"Content-Type": "application/yaml"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_functions_rest_plan_apply_export_round_trip(spark):
    srv = ConfigApiServer(ConfigRegistry()).start()
    try:
        status, body = _post_yaml(srv.url("plan"), REGISTRY_YAML)
        assert status == 200
        assert {c["resource"] for c in body["changes"]} == {
            "function", "sink_consumer"}
        status, body = _post_yaml(srv.url("apply"), REGISTRY_YAML)
        assert status == 200 and len(body["resources"]) == 3
        # export renders a loadable doc containing the functions section
        with urllib.request.urlopen(srv.url("export"), timeout=10) as resp:
            yaml_out = json.loads(resp.read())["yaml"]
        fns, specs = load_config(yaml_out)
        assert [f.name for f in fns] == ["big-orders", "flatten"]
        assert specs[0].filter == "big-orders"
        # re-apply of the export is a no-op plan
        status, body = _post_yaml(srv.url("plan"), yaml_out)
        assert all(c["action"] == "unchanged" for c in body["changes"])
        # bad reference → 422, nothing committed
        status, body = _post_yaml(
            srv.url("apply"),
            "consumers:\n  - {name: c2, sink_type: benchmark, filter: ghost}\n")
        assert status == 422
    finally:
        srv.stop()


# -- enrichment through the full pipeline -----------------------------------

ENRICH_YAML = """
functions:
  - name: segment-lookup
    type: enrichment
    code: "SELECT c_custkey, c_mktsegment FROM customer_src
           WHERE c_custkey = ANY($1)"
consumers:
  - name: customers-enriched
    sink_type: file_log
    transform: default
    enrichment: segment-lookup
"""


def test_enrichment_applied_through_pipeline(spark, sf_dir, tmp_path):
    """A consumer referencing an enrichment function delivers events
    whose metadata.enrichment holds the SQL's columns (consumers.ex
    batched-PK enrichment → metadata.enrichment)."""
    import json as _json

    from sequin_spark.cdc import eventize_customer, load_table
    from sequin_spark.streaming.pipeline import ConsumerPipeline

    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_src")
    reg = ConfigRegistry()
    fns, specs = load_config(ENRICH_YAML)
    out_dir = tmp_path / "out"
    specs[0].sink_config = {"path": str(out_dir)}
    assert "errors" not in reg.apply(specs, fns)
    spec = reg.resolved_consumer("customers-enriched")
    assert "ANY($1)" in spec.enrichment

    pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / "state"))
    ev = eventize_customer(spark, sf_dir).limit(20)
    stats = pipe.run_batch(ev)
    assert stats["delivered"] == 20
    rows = []
    for f in out_dir.iterdir():
        rows += [_json.loads(line) for line in f.read_text().splitlines()]
    payloads = [_json.loads(r["value"]) for r in rows]
    assert len(payloads) == 20
    for p in payloads:
        enr = p["metadata"]["enrichment"]
        assert str(enr["c_custkey"]) == str(p["record"]["c_custkey"])
        assert enr["c_mktsegment"] in (
            "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def test_enrichment_sql_requires_any_clause(spark, sf_dir, tmp_path):
    from sequin_spark.cdc import eventize_customer
    from sequin_spark.operators.enrichment import enrich_from_spec

    ev = eventize_customer(spark, sf_dir).limit(1)
    with pytest.raises(ValueError, match="ANY"):
        enrich_from_spec(spark, ev, "SELECT 1 AS c_custkey")


def test_enrichment_zero_rows_ok_multi_rows_fail(spark, sf_dir):
    """consumers_test.exs:1041,1081 (enrich_messages!): an enrichment
    query matching ZERO rows for a message succeeds (null-field
    enrichment struct); matching MORE than one row is a hard error —
    a silent left-join fan-out would duplicate the message and corrupt
    exactly-once delivery counts."""
    from sequin_spark.cdc import eventize_customer
    from sequin_spark.operators.enrichment import enrich_from_spec

    ev = eventize_customer(spark, sf_dir).limit(5)
    spark.sql("SELECT 999999999 AS c_custkey, 'x' AS note"
              ).createOrReplaceTempView("enr_nomatch")
    out = enrich_from_spec(
        spark, ev,
        "SELECT c_custkey, note FROM enr_nomatch WHERE c_custkey = ANY($1)")
    rows = out.select("enrichment").collect()
    assert len(rows) == 5 and all(r["enrichment"]["note"] is None
                                  for r in rows)
    # every PK now matches TWO enrichment rows → must raise, not fan out
    ks = [r["record"]["c_custkey"] for r in ev.select("record").collect()]
    spark.createDataFrame(
        [(int(k), tag) for k in ks for tag in ("a", "b")],
        "c_custkey long, note string").createOrReplaceTempView("enr_dup")
    dup = enrich_from_spec(
        spark, ev,
        "SELECT c_custkey, note FROM enr_dup WHERE c_custkey = ANY($1)")
    with pytest.raises(Exception, match="rows for one message"):
        dup.collect()


# -- routing functions ------------------------------------------------------

ROUTING_YAML = """
functions:
  - name: by-region
    type: routing
    code: "{'topic': 'orders-' + record['o_orderpriority']}"
consumers:
  - name: orders-routed
    sink_type: file_log
    routing: by-region
    transform: record_only
"""


def test_routing_function_through_pipeline(spark, sf_dir, tmp_path):
    """A consumer referencing a routing function routes deliveries by
    the function's dict-literal keys (routing.ex:105-135)."""
    import json as _json

    from sequin_spark.cdc import eventize_orders
    from sequin_spark.streaming.pipeline import ConsumerPipeline

    reg = ConfigRegistry()
    fns, specs = load_config(ROUTING_YAML)
    out_dir = tmp_path / "out"
    specs[0].sink_config = {"path": str(out_dir)}
    assert "errors" not in reg.apply(specs, fns)
    spec = reg.resolved_consumer("orders-routed")
    assert spec.routing.startswith("{")

    pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / "state"))
    compiled = pipe.compile(eventize_orders(spark, sf_dir).limit(30))
    topics = {r["topic"] for r in compiled.select("topic").collect()}
    assert topics and all(t.startswith("orders-") for t in topics)


def test_routing_function_validation(spark):
    # unknown routing key for the sink's schema → 422 at apply
    reg = ConfigRegistry()
    fns, specs = load_config(
        "functions:\n"
        "  - {name: r, type: routing, code: \"{'nope': 'x'}\"}\n"
        "consumers:\n"
        "  - {name: c, sink_type: file_log, routing: r}\n")
    # function itself is fine; the consumer's schema check runs at
    # validate-time AFTER resolution — resolved spec fails validate
    resolved = resolve_consumer(specs[0], {f.name: f for f in fns})
    errs = resolved.validate()
    assert any("nope" in e for e in errs)
    # non-dict routing code is rejected
    bad = ConsumerSpec(name="c", sink_type="file_log",
                       routing="record['x']")
    assert any("dict literal" in e for e in bad.validate())
