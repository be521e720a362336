"""Trace events (runtime/trace.ex: per-consumer PubSub + Event shape;
console trace tab show.ex:160,273): bounded rings, pub/sub, delivery-
engine publication, REST surface."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.streaming.trace import TraceEvent, Tracer


def test_ring_bounded_and_newest_first():
    tr = Tracer(ring_size=5)
    for i in range(8):
        tr.info("c1", f"event {i}")
    events = tr.events("c1")
    assert len(events) == 5  # ring trims (the console's finite window)
    assert events[0].message == "event 7"  # newest first
    assert all(e.published_at > 0 for e in events)


def test_status_levels_and_filters():
    tr = Tracer()
    tr.info("c1", "ok")
    tr.warning("c1", "meh", extra={"n": 2})
    tr.error("c1", "bad", error="boom")
    assert [e.message for e in tr.events("c1", status="error")] == ["bad"]
    assert tr.events("c1", status="warning")[0].extra == {"n": 2}
    assert tr.events("c1", limit=2)[0].message == "bad"
    # unknown consumer → empty; publish(None) is a no-op (trace.ex:154)
    assert tr.events("ghost") == []
    tr.info(None, "dropped")


def test_subscribe_unsubscribe():
    tr = Tracer()
    got = []
    tr.subscribe("c1", got.append)
    tr.info("c1", "hello")
    tr.info("c2", "other consumer")
    assert [e.message for e in got] == ["hello"]
    tr.unsubscribe("c1", got.append)
    tr.info("c1", "after")
    assert len(got) == 1


def test_event_external_shape():
    e = TraceEvent("error", "Failed to deliver messages to HTTP endpoint",
                   req_request={"method": "POST", "url": "http://x/hook"},
                   error="http 500", extra={"batch_id": 3})
    ext = e.to_external()
    # trace.ex Event.to_external key set
    assert set(ext) == {"status", "message", "req_request", "req_response",
                        "error", "extra", "published_at"}
    assert ext["req_request"]["url"] == "http://x/hook"


def test_delivery_engine_publishes_traces(spark, tmp_path):
    """Engine → trace ring: delivered info events, failure error events
    with the sink error attached (http_push_pipeline.ex:177-207)."""
    import json as _json

    from sequin_spark.streaming.delivery import DeliveryEngine

    tracer = Tracer()
    rows = [(f"g{i}", 100 + i, 0, f"k{i}", f"g{i}",
             _json.dumps({"n": i})) for i in range(6)]
    df = spark.createDataFrame(
        rows,
        "group_id string, commit_lsn long, commit_idx long, "
        "idempotency_key string, key string, value string",
    )
    eng = DeliveryEngine(
        sink_type="benchmark", state_dir=str(tmp_path / "ok"),
        tracer=tracer, consumer_id="orders")
    eng.process_batch(df, batch_id=0)
    events = tracer.events("orders")
    assert any(e.status == "info" and e.extra.get("delivered") == 6
               for e in events)

    failing = DeliveryEngine(
        sink_type="failing", sink_config={"fail_substring": "g"},
        state_dir=str(tmp_path / "bad"), batch_size=1,
        tracer=tracer, consumer_id="broken")
    failing.process_batch(df, batch_id=0)
    errs = tracer.events("broken", status="error")
    assert errs and errs[0].extra.get("failed", 0) > 0
    assert errs[0].error  # first failure reason attached


def test_trace_rest_route(spark, tmp_path):
    from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry
    from sequin_spark.plans.spec import ConsumerSpec

    tracer = Tracer()
    tracer.info("orders", "Messages delivered to benchmark sink",
                extra={"delivered": 3})
    tracer.error("orders", "Failed to deliver", error="boom")
    registry = ConfigRegistry()
    registry.apply([ConsumerSpec(name="orders", sink_type="benchmark")])
    srv = ConfigApiServer(registry=registry, tracer=tracer).start()
    try:
        base = f"http://127.0.0.1:{srv.port}/api/sinks"
        with urllib.request.urlopen(f"{base}/orders/trace", timeout=10) as r:
            body = json.loads(r.read())
        assert [e["status"] for e in body["data"]] == ["error", "info"]
        with urllib.request.urlopen(
                f"{base}/orders/trace?status=error&limit=1", timeout=10) as r:
            body = json.loads(r.read())
        assert len(body["data"]) == 1 and body["data"][0]["error"] == "boom"
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/ghost/trace", timeout=10)
        assert e.value.code == 404
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"{base}/orders/trace?status=bogus", timeout=10)
        assert e.value.code == 400
    finally:
        srv.stop()
