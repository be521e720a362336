"""Health folding + entity status (health.ex / health/event.ex parity)."""

from sequin_spark.health import Health
from sequin_spark.plans.spec import ConsumerSpec
from sequin_spark.streaming.pipeline import ConsumerPipeline


def test_event_folding_latest_per_slug():
    h = Health("c1")
    h.put_event("messages_delivered", "success")
    h.put_event("messages_delivered", "fail", "boom")
    ev = h.events["messages_delivered"]
    assert ev.status == "fail" and ev.error == "boom"
    assert ev.last_success_at is not None and ev.last_fail_at is not None
    assert ev.last_fail_at >= ev.last_success_at
    h.put_event("messages_delivered", "success")
    ev = h.events["messages_delivered"]
    assert ev.status == "success" and ev.error is None  # error cleared


def test_entity_status_vocabulary():
    h = Health("c1", expected_slugs=("messages_ingested", "messages_delivered"))
    assert h.status() == "initializing"  # expected checks unseen
    h.put_event("messages_ingested")
    assert h.status() == "initializing"
    h.put_event("messages_delivered")
    assert h.status() == "healthy"
    h.put_event("messages_pending_delivery", "warning", "pending=9")
    assert h.status() == "warning"
    h.put_event("messages_delivered", "fail", "sink down")
    assert h.status() == "error"  # fail wins over warning
    h.paused = True
    assert h.status() == "paused"  # paused wins over everything
    h.paused = False
    snap = h.snapshot()
    assert snap["status"] == "error"
    assert snap["checks"]["messages_delivered"]["error"] == "sink down"


def test_pipeline_feeds_health(spark, sf_dir, tmp_path):
    from sequin_spark.cdc import eventize_orders

    spec = ConsumerSpec(name="orders-noop", sink_type="benchmark", batch_size=100)
    pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / "state"))
    assert pipe.health.status() == "initializing"
    pipe.run_batch(eventize_orders(spark, sf_dir).limit(100), 0)
    assert pipe.health.status() == "healthy"
    snap = pipe.health.snapshot()
    assert snap["checks"]["messages_delivered"]["status"] == "success"
    assert snap["checks"]["messages_pending_delivery"]["status"] == "info"


def test_pipeline_health_degrades_on_failure(spark, tmp_path):
    import json

    df = spark.createDataFrame(
        [(f"g{i}", 100 + i, 0, f"ik-{i}", f"bad-{i}", json.dumps({"n": i}))
         for i in range(5)],
        "group_id string, commit_lsn long, commit_idx long, idempotency_key string, "
        "key string, value string",
    )
    from sequin_spark.streaming.delivery import DeliveryEngine

    engine = DeliveryEngine(
        "failing", {"fail_substring": "bad"},
        state_dir=str(tmp_path / "state"), partition_count=2,
    )
    h = Health("c-fail", expected_slugs=("messages_ingested",))
    h.observe_batch(engine.process_batch(df, 0))
    assert h.status() == "error"
    assert "failed=5" in h.events["messages_delivered"].error
