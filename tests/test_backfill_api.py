"""Backfill management REST e2e (router.ex:173 resources
/api/sinks/:sink_id_or_name/backfills, backfill_controller.ex
index/show/create/update, backfill.ex:60-98 state machine): create,
poll progress counters, pause/resume, cancel, validation errors."""

import json
import time
import urllib.error
import urllib.request

import pytest

from sequin_spark.operators.source_filter import Source
from sequin_spark.plans.backfill_api import BackfillManager
from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry
from sequin_spark.plans.spec import ConsumerSpec


def _req(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json"},
        method=method,
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def api(spark):
    """Server over a 500-row customer table, 100-row pages, throttled so
    pause/cancel can land mid-run."""
    df = (
        spark.range(500)
        .selectExpr("id AS c_custkey", "concat('name-', id) AS c_name")
        .cache()
    )
    df.count()

    def resolver(table_ref):
        if table_ref != "public.customer":
            raise KeyError(table_ref)
        return df, ["c_custkey"]

    registry = ConfigRegistry()
    registry.apply([ConsumerSpec(
        name="customers-sink", sink_type="benchmark",
        source=Source(include_schemas=["public"]),
    )])
    # 300ms/page × 5 pages ≥ 1.5s run — wide enough that pause/cancel
    # PATCHes land mid-run even when the suite saturates the machine
    mgr = BackfillManager(resolver, initial_page_size=100, throttle_ms=300)
    srv = ConfigApiServer(registry=registry, backfills=mgr).start()
    base = f"http://127.0.0.1:{srv.port}/api/sinks"
    try:
        yield base
    finally:
        srv.stop()
        df.unpersist()


def _wait_state(base, bf_id, state, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        code, body = _req("GET", f"{base}/customers-sink/backfills/{bf_id}")
        assert code == 200
        if body["state"] == state:
            return body
        time.sleep(0.1)
    raise AssertionError(f"backfill never reached {state}: {body}")


def test_backfill_create_poll_complete(api):
    code, bf = _req("POST", f"{api}/customers-sink/backfills",
                    {"table": "public.customer"})
    assert code == 200
    assert bf["state"] == "active"
    assert bf["sink_consumer"] == "customers-sink"
    assert bf["table"] == "public.customer"
    assert bf["rows_initial_count"] == 500

    done = _wait_state(api, bf["id"], "completed")
    assert done["rows_processed_count"] == 500
    assert done["rows_ingested_count"] == 500
    assert done["completed_at"] is not None

    # index lists it (backfill_controller.ex index)
    code, body = _req("GET", f"{api}/customers-sink/backfills")
    assert code == 200
    assert [j["id"] for j in body["data"]] == [bf["id"]]


def test_backfill_pause_resume_cancel(api):
    code, bf = _req("POST", f"{api}/customers-sink/backfills",
                    {"table": "public.customer"})
    assert code == 200

    code, paused = _req("PATCH", f"{api}/customers-sink/backfills/{bf['id']}",
                        {"state": "paused"})
    assert code == 200 and paused["state"] == "paused"
    # progress freezes while paused (loop parks at a page boundary) —
    # poll until two reads 0.5s apart agree, so an in-flight page that
    # started before the pause can drain without tripping the check
    deadline = time.time() + 15
    while True:
        _, a = _req("GET", f"{api}/customers-sink/backfills/{bf['id']}")
        time.sleep(0.5)
        _, b = _req("GET", f"{api}/customers-sink/backfills/{bf['id']}")
        if a["rows_processed_count"] == b["rows_processed_count"]:
            break
        assert time.time() < deadline, f"progress never froze: {a} → {b}"
    assert b["rows_processed_count"] < 500

    # paused → active resumes (backfill.ex:93 paused: [active, cancelled])
    code, resumed = _req("PATCH", f"{api}/customers-sink/backfills/{bf['id']}",
                         {"state": "active"})
    assert code == 200 and resumed["state"] == "active"

    code, cancelled = _req("PATCH", f"{api}/customers-sink/backfills/{bf['id']}",
                           {"state": "cancelled"})
    assert code == 200 and cancelled["state"] == "cancelled"
    assert cancelled["canceled_at"] is not None

    # terminal states are frozen (backfill.ex:95-97)
    code, err = _req("PATCH", f"{api}/customers-sink/backfills/{bf['id']}",
                     {"state": "active"})
    assert code == 422
    assert "Invalid state transition from cancelled" in err["error"]


def test_backfill_validation_errors(api):
    # unknown sink → 404 (find_sink_consumer failure)
    code, _ = _req("POST", f"{api}/nope/backfills", {"table": "public.customer"})
    assert code == 404
    # table required (backfill_controller.ex:84-86)
    code, err = _req("POST", f"{api}/customers-sink/backfills", {})
    assert code == 422 and "Table reference is required" in err["error"]
    # unknown table
    code, err = _req("POST", f"{api}/customers-sink/backfills",
                     {"table": "public.missing"})
    assert code == 422 and "not found" in err["error"]
    # unknown field rejected (from_external_backfill, transforms.ex:1614-1616)
    code, err = _req("POST", f"{api}/customers-sink/backfills",
                     {"table": "public.customer", "bogus": 1})
    assert code == 422 and "Unknown field: bogus" in err["error"]

    # one non-terminal backfill per (sink, table) — backfill.ex:68-71
    code, bf = _req("POST", f"{api}/customers-sink/backfills",
                    {"table": "public.customer", "state": "paused"})
    assert code == 200 and bf["state"] == "paused"
    code, err = _req("POST", f"{api}/customers-sink/backfills",
                     {"table": "public.customer"})
    assert code == 422 and "already has an active backfill" in err["error"]
    # unknown field on update
    code, err = _req("PATCH", f"{api}/customers-sink/backfills/{bf['id']}",
                     {"state": "cancelled", "rows": 1})
    assert code == 422 and "Unknown field: rows" in err["error"]
    # cancel clears the uniqueness slot → create succeeds again
    code, _ = _req("PATCH", f"{api}/customers-sink/backfills/{bf['id']}",
                   {"state": "cancelled"})
    assert code == 200
    code, bf2 = _req("POST", f"{api}/customers-sink/backfills",
                     {"table": "public.customer"})
    assert code == 200
    _wait_state(api, bf2["id"], "completed")
    # unknown backfill id → 404
    code, _ = _req("GET", f"{api}/customers-sink/backfills/bf_nope")
    assert code == 404
