"""HTTP pull API e2e — receive/ack/nack over the wire
(pull_controller.ex:14-53 + router.ex:180-189 parity)."""

import json
import urllib.error
import urllib.request

import pytest

from sequin_spark.streaming.pull_api import PullApiServer, parse_duration_ms
from sequin_spark.streaming.pull_queue import PullQueue


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture()
def api(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"g{i % 3}", 100 + i, 0, json.dumps({"n": i})) for i in range(9)],
        "group_id string, commit_lsn long, commit_idx long, value string",
    )
    queue = PullQueue(str(tmp_path / "pq"), ack_wait_s=30.0)
    queue.ingest(df)
    server = PullApiServer({"orders-pull": queue}).start()
    yield server
    server.stop()


def test_receive_ack_nack_over_http(api):
    recv = api.url("orders-pull", "receive")
    # receive leases one message per group (group blocking): 3 groups
    status, body = _post(recv, {"max_batch_size": 10})
    assert status == 200
    msgs = body["data"]
    assert len(msgs) == 3
    assert {json.loads(m["data"])["n"] for m in msgs} == {0, 1, 2}
    # redelivery protection: second receive yields nothing (groups leased)
    _, body2 = _post(recv, {"max_batch_size": 10})
    assert body2["data"] == []
    # ack two, nack one → nacked group's head redelivers, acked groups advance
    acked = [m["ack_id"] for m in msgs[:2]]
    nacked = [msgs[2]["ack_id"]]
    assert _post(api.url("orders-pull", "ack"), {"ack_ids": acked})[1]["success"]
    assert _post(api.url("orders-pull", "nack"), {"ack_ids": nacked})[1]["success"]
    _, body3 = _post(recv, {"max_batch_size": 10})
    ns = sorted(json.loads(m["data"])["n"] for m in body3["data"])
    redelivered = json.loads(msgs[2]["data"])["n"]
    assert redelivered in ns and len(ns) == 3
    deliver_counts = {json.loads(m["data"])["n"]: m["deliver_count"] for m in body3["data"]}
    assert deliver_counts[redelivered] == 2  # nacked message redelivered


def test_receive_get_with_query_params(api):
    # router.ex:181 — receive is also a GET
    with urllib.request.urlopen(
        api.url("orders-pull", "receive") + "?max_batch_size=2", timeout=10
    ) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200 and len(body["data"]) == 2


def test_legacy_prefix_and_batch_size_alias(api):
    # /http_pull_consumers prefix (router.ex:186-189) + legacy batch_size param
    url = api.url("orders-pull", "receive").replace("sequin_streams", "http_pull_consumers")
    status, body = _post(url, {"batch_size": 1})
    assert status == 200 and len(body["data"]) == 1


def test_error_contract(api):
    # bad batch size
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(api.url("orders-pull", "receive"), {"max_batch_size": 0})
    assert e.value.code == 400
    assert "max_batch_size" in json.loads(e.value.read())["error"]
    # bad ack_ids
    for bad in ({}, {"ack_ids": []}, {"ack_ids": ["nope"]}, {"ack_ids": "x"}):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(api.url("orders-pull", "ack"), bad)
        assert e.value.code == 400
        assert "ack_ids" in json.loads(e.value.read())["error"]
    # unknown consumer → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(api.url("nope", "receive"), {})
    assert e.value.code == 404
    # bad wait_for
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(api.url("orders-pull", "receive"), {"wait_for": "tomorrow"})
    assert e.value.code == 400


def test_parse_duration():
    assert parse_duration_ms("60s") == 60_000
    assert parse_duration_ms("5m") == 300_000
    assert parse_duration_ms("1000ms") == 1000
    assert parse_duration_ms(2500) == 2500
    assert parse_duration_ms("nope") is None


def test_pull_queue_caps_driver_window_and_spills(spark, tmp_path):
    """Backlog beyond max_pending never sits in the driver frame: it
    spills to cursor-ordered parquet chunks and refills as the window
    drains (slot_message_store_state.ex:18,76-91 bounds + overflow
    persistence parity). receive/ack stay exact across the spill."""
    n = 250
    df = spark.createDataFrame(
        [(f"g{i}", 1000 + i, 0, json.dumps({"n": i})) for i in range(n)],
        "group_id string, commit_lsn long, commit_idx long, value string",
    )
    q = PullQueue(str(tmp_path / "pq"), ack_wait_s=30.0, max_pending=100)
    assert q.ingest(df) == n
    # driver window bounded; the rest is on disk
    assert q.window_size() <= 100
    assert q.spilled() == n - q.window_size()
    assert q.depth() == n

    # drain everything: receive leases in cursor order, ack triggers
    # refill from spill — every message arrives exactly once, in order
    seen = []
    while True:
        got = q.receive(batch_size=40)
        if not got:
            break
        assert q.window_size() <= 100
        seen += [json.loads(m["data"])["n"] for m in got]
        q.ack([m["ack_id"] for m in got])
    assert seen == list(range(n))
    assert q.depth() == 0 and q.spilled() == 0


def test_pull_queue_spill_survives_restart(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 2000 + i, 0, json.dumps({"n": i})) for i in range(60)],
        "group_id string, commit_lsn long, commit_idx long, value string",
    )
    q = PullQueue(str(tmp_path / "pq"), max_pending=25)
    q.ingest(df)
    assert q.spilled() > 0

    q2 = PullQueue(str(tmp_path / "pq"), max_pending=25)
    assert q2.depth() == 60
    got = q2.receive(batch_size=10)
    assert [json.loads(m["data"])["n"] for m in got] == list(range(10))
    # ingest after restart keeps appending behind the existing backlog
    more = spark.createDataFrame(
        [(None, 3000, 0, json.dumps({"n": 99}))],
        "group_id string, commit_lsn long, commit_idx long, value string",
    )
    assert q2.ingest(more) == 61
