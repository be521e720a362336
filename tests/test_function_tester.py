"""Function tester (functions/test_messages.ex ring + the console
editor's run-against-messages panel, functions/edit.ex:246-380):
capture ring semantics, run_function over all three function types,
REST + CLI surfaces."""

import io
import json

import pytest

from sequin_spark.functions.tester import (
    MAX_MESSAGE_COUNT,
    TestMessages,
    run_function,
    synthetic_message,
)


def _msg(i, **record):
    return {
        "action": "insert",
        "record": {"id": str(i), **{k: str(v) for k, v in record.items()}},
        "changes": None,
        "metadata": {"table_name": "t", "trace_id": f"tr-{i}"},
    }


# -- capture ring (functions_test_messages_test.exs ports) ------------------

def test_ring_caps_at_max_and_deletes_by_trace_id():
    tm = TestMessages()
    assert tm.get_test_messages("db1", 1) == []
    for i in range(MAX_MESSAGE_COUNT):
        assert tm.add_test_message("db1", 1, _msg(i))
    # over the limit → rejected (add_test_message/2:67-76)
    assert not tm.add_test_message("db1", 1, _msg(99))
    assert len(tm.get_test_messages("db1", 1)) == MAX_MESSAGE_COUNT
    # other (db, table) keys are independent
    assert tm.add_test_message("db1", 2, _msg(0))
    assert tm.add_test_message("db2", 1, _msg(0))
    # delete by trace id
    assert tm.delete_test_message("db1", 1, "tr-3")
    assert not tm.delete_test_message("db1", 1, "tr-3")
    assert len(tm.get_test_messages("db1", 1)) == MAX_MESSAGE_COUNT - 1
    tm.delete_test_messages("db1", 1)
    assert tm.get_test_messages("db1", 1) == []


def test_needs_messages_registry():
    tm = TestMessages()
    assert not tm.needs_messages("db1")
    tm.register_needs_messages("db1")
    assert tm.needs_messages("db1")
    tm.unregister_needs_messages("db1")
    assert not tm.needs_messages("db1")


# -- run_function -----------------------------------------------------------

def test_run_transform_filter_routing(spark):
    msgs = [_msg(1, score="10"), _msg(2, score="99")]
    # transform expression
    out = run_function(spark, "transform", "record['score'] + '!'", msgs)
    assert [r["result"] for r in out] == ["10!", "99!"]
    assert [r["trace_id"] for r in out] == ["tr-1", "tr-2"]
    # filter predicate
    out = run_function(spark, "filter", "record['score'] == '99'", msgs)
    assert [r["result"] for r in out] == [False, True]
    # routing dict literal
    out = run_function(
        spark, "routing", "{'topic': 'orders-' + record['id']}", msgs)
    assert json.loads(out[0]["result"]) == {"topic": "orders-1"}
    # path + builtin shapes
    out = run_function(spark, "transform", "path:record.id", msgs)
    assert [r["result"] for r in out] == ["1", "2"]
    out = run_function(spark, "transform", "record_only", msgs)
    assert json.loads(out[1]["result"])["score"] == "99"


def test_run_function_synthetic_default_and_errors(spark):
    # no messages → the synthetic sample (Consumers.synthetic_message)
    out = run_function(spark, "transform", "record['name']")
    assert out == [{"trace_id": "synthetic-0000",
                    "result": "Paul Atreides"}]
    # invalid code → a single error entry, no exception
    out = run_function(spark, "filter", "import os", None)
    assert len(out) == 1 and "error" in out[0]
    out = run_function(spark, "nope-type", "record", None)
    assert "error" in out[0]


# -- REST + CLI -------------------------------------------------------------

def test_function_tester_rest_and_cli(spark, tmp_path, monkeypatch):
    from sequin_spark.cli import main
    from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry

    srv = ConfigApiServer(ConfigRegistry(), spark=spark).start()
    monkeypatch.setenv("SEQUIN_CONTEXT_DIR", str(tmp_path / "ctx"))
    try:
        out = io.StringIO()
        assert main(["context", "add", "t", "--hostname",
                     f"127.0.0.1:{srv.port}", "--api-token", "x"],
                    out=out) == 0
        msg_file = tmp_path / "m.json"
        msg_file.write_text(json.dumps(_msg(7, region="emea")))
        out = io.StringIO()
        rc = main(["functions", "test", "--type", "transform",
                   "--code", "record['region'].upper()",
                   "--message", str(msg_file)], out=out)
        assert rc == 0
        assert json.loads(out.getvalue())[0]["result"] == "EMEA"
        # compile error → 422 → CLI error exit
        out = io.StringIO()
        rc = main(["functions", "test", "--type", "filter",
                   "--code", "__import__('os')"], out=out)
        assert rc == 1
    finally:
        srv.stop()


def test_synthetic_message_is_canonical_shape():
    m = synthetic_message()
    assert {"action", "record", "changes", "metadata"} <= set(m)
    assert m["metadata"]["trace_id"]
