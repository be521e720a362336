"""Prometheus metrics surface (prometheus.ex / prometheus_exporter.ex
analog): delivery counters fold into text exposition served at /metrics."""

import json
import urllib.request

from sequin_spark.plans.spec import ConsumerSpec
from sequin_spark.streaming.metrics import (
    ConsumerMetrics,
    MetricsServer,
    prometheus_text,
)
from sequin_spark.streaming.pipeline import ConsumerPipeline


def test_counters_accumulate_and_render():
    m = ConsumerMetrics()
    m.record_batch("c1", {"delivered": 10, "failed": 2, "pending": 5})
    m.record_batch("c1", {"delivered": 7, "failed": 0, "pending": 3})
    m.record_batch("c2", {"delivered": 1})
    text = prometheus_text(m)
    assert '# TYPE sequin_message_deliver_success_total counter' in text
    assert 'sequin_message_deliver_success_total{consumer="c1"} 17' in text
    assert 'sequin_message_deliver_failure_total{consumer="c1"} 2' in text
    assert 'sequin_messages_pending{consumer="c1"} 3' in text  # gauge: last wins
    assert 'sequin_delivery_batches_total{consumer="c2"} 1' in text


def test_pipeline_feeds_metrics_and_scrape(spark, sf_dir, tmp_path):
    from sequin_spark.cdc import eventize_orders

    spec = ConsumerSpec(name="orders-noop", sink_type="benchmark", batch_size=100)
    pipe = ConsumerPipeline(spec, state_dir=str(tmp_path / "state"))
    ev = eventize_orders(spark, sf_dir).limit(200)
    stats = pipe.run_batch(ev, 0)
    assert stats["delivered"] > 0
    server = MetricsServer(pipe.metrics).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/metrics", timeout=10
        ) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            body = resp.read().decode()
    finally:
        server.stop()
    assert f'sequin_message_deliver_success_total{{consumer="orders-noop"}} {stats["delivered"]}' in body
    assert 'sequin_delivery_batches_total{consumer="orders-noop"} 1' in body
