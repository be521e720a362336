"""Message browse/peek API (show.ex:1191-1367 peek surface + state
derivation, message_controller.ex REST params): list in-flight /
backing-off / acked messages per sink, peek one by id, filters."""

import json
import os
import urllib.error
import urllib.request

import pandas as pd
import pytest

from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry
from sequin_spark.plans.messages_api import MessageBrowser
from sequin_spark.plans.spec import ConsumerSpec
from sequin_spark.streaming.pull_queue import PullQueue


def _get(url):
    try:
        with urllib.request.urlopen(url, timeout=10) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def queue(spark, tmp_path):
    df = spark.createDataFrame(
        [(f"g{i % 2}", 100 + i, 0, json.dumps({"n": i})) for i in range(6)],
        "group_id string, commit_lsn long, commit_idx long, value string",
    )
    q = PullQueue(str(tmp_path / "pq"), ack_wait_s=30.0)
    q.ingest(df)
    return q


class _FakeEngine:
    """Bounded-store stand-in: ring/pending/discarded parquet files the
    way DeliveryEngine writes them."""

    def __init__(self, state_dir):
        self.state_dir = str(state_dir)
        os.makedirs(os.path.join(self.state_dir, "acked"), exist_ok=True)
        os.makedirs(self.discarded_dir, exist_ok=True)

    @property
    def acked_ring_path(self):
        return os.path.join(self.state_dir, "acked", "ring.parquet")

    @property
    def discarded_dir(self):
        return os.path.join(self.state_dir, "discarded")

    def acked_ring(self):
        if os.path.exists(self.acked_ring_path):
            return pd.read_parquet(self.acked_ring_path)
        return None

    def _read_pending(self):
        p = os.path.join(self.state_dir, "pending.parquet")
        return pd.read_parquet(p) if os.path.exists(p) else None


def _engine_with_history(tmp_path):
    eng = _FakeEngine(tmp_path / "eng")
    pd.DataFrame({
        "commit_lsn": [10, 11], "commit_idx": [0, 0],
        "idempotency_key": ["k10", "k11"], "group_id": ["a", "b"],
        "deliver_count": [1, 2], "acked_at": [1000.0, 1001.0],
    }).to_parquet(eng.acked_ring_path)
    pd.DataFrame({
        "commit_lsn": [12], "commit_idx": [0], "idempotency_key": ["k12"],
        "group_id": ["a"], "deliver_count": [3],
        "not_visible_until": [9e12], "value": ['{"n": 12}'],
    }).to_parquet(os.path.join(eng.state_dir, "pending.parquet"))
    pd.DataFrame({
        "commit_lsn": [13], "commit_idx": [0], "idempotency_key": ["k13"],
        "group_id": ["b"], "deliver_count": [5], "value": ['{"n": 13}'],
        "error": ["boom"],
    }).to_parquet(os.path.join(eng.discarded_dir, "d1.parquet"))
    return eng


# -- MessageBrowser unit surface -------------------------------------------

def test_browser_states_and_order(queue, tmp_path):
    # lease two messages → "delivering"; rest stay "available"
    leased = queue.receive(batch_size=2)
    browser = MessageBrowser(queue=queue,
                             engine=_engine_with_history(tmp_path))
    out = browser.list(order="seq_asc")
    states = {r["id"]: r["state"] for r in out["data"]}
    for m in leased:
        assert states[m["ack_id"]] == "delivering"
    assert sum(1 for s in states.values() if s == "available") == 4
    assert sum(1 for s in states.values() if s == "delivered") == 2
    assert sum(1 for s in states.values() if s == "backing off") == 1
    assert sum(1 for s in states.values() if s == "discarded") == 1
    assert out["total_count"] == 10
    seqs = [r["seq"] for r in out["data"]]
    assert seqs == sorted(seqs)
    # seq_desc reverses
    seqs_desc = [r["seq"] for r in browser.list(order="seq_desc")["data"]]
    assert seqs_desc == sorted(seqs_desc, reverse=True)


def test_browser_filters(queue, tmp_path):
    queue.receive(batch_size=2)
    browser = MessageBrowser(queue=queue,
                             engine=_engine_with_history(tmp_path))
    # visible=True → only deliverable rows (parse_visible is_deliverable)
    vis = browser.list(visible=True)["data"]
    assert all(r["state"] == "available" for r in vis) and len(vis) == 4
    # state filter
    backed = browser.list(state="backing off")["data"]
    assert [r["id"] for r in backed] == ["k12"]
    # show_acked=False hides ring + discarded
    unacked = browser.list(show_acked=False)["data"]
    assert all(r["state"] not in ("delivered", "discarded")
               for r in unacked)
    # limit caps data but total_count is the full set
    lim = browser.list(limit=3)
    assert len(lim["data"]) == 3 and lim["total_count"] == 10


def test_browser_peek_and_validation(queue, tmp_path):
    leased = queue.receive(batch_size=1)
    browser = MessageBrowser(queue=queue,
                             engine=_engine_with_history(tmp_path))
    one = browser.get(leased[0]["ack_id"])
    assert one is not None and one["state"] == "delivering"
    assert json.loads(one["data"])["n"] in range(6)
    assert browser.get("k11")["state"] == "delivered"
    assert browser.get("nope") is None
    with pytest.raises(ValueError):
        browser.list(limit=0)
    with pytest.raises(ValueError):
        browser.list(limit=10_001)
    with pytest.raises(ValueError):
        browser.list(order="sideways")


# -- REST routes (message_controller.ex shapes) -----------------------------

@pytest.fixture()
def api(queue, tmp_path):
    registry = ConfigRegistry()
    registry.apply([ConsumerSpec(name="orders-pull",
                                 sink_type="sequin_stream")])
    browser = MessageBrowser(queue=queue,
                             engine=_engine_with_history(tmp_path))
    srv = ConfigApiServer(registry=registry,
                          messages={"orders-pull": browser}).start()
    yield srv
    srv.stop()


def test_messages_rest_list_show(api, queue):
    queue.receive(batch_size=2)
    base = f"http://127.0.0.1:{api.port}/api/sinks/orders-pull/messages"
    code, body = _get(base)
    assert code == 200
    assert body["total_count"] == 10 and len(body["data"]) == 10
    code, body = _get(base + "?limit=2&sort=seq_desc")
    assert code == 200 and len(body["data"]) == 2
    assert body["data"][0]["seq"] >= body["data"][1]["seq"]
    code, body = _get(base + "?state=delivering")
    assert code == 200 and len(body["data"]) == 2
    code, body = _get(base + "?visible=true&show_acked=false")
    assert code == 200
    assert all(r["state"] == "available" for r in body["data"])
    # peek one
    mid = body["data"][0]["id"]
    code, one = _get(f"{base}/{mid}")
    assert code == 200 and one["id"] == mid
    # missing id → the console's not-found wording
    code, err = _get(f"{base}/deadbeef")
    assert code == 404 and "not found" in err["error"].lower()
    # bad params → 400
    assert _get(base + "?limit=0")[0] == 400
    assert _get(base + "?sort=bogus")[0] == 400
    assert _get(base + "?visible=maybe")[0] == 400


def test_messages_rest_unknown_sink(api):
    code, _ = _get(
        f"http://127.0.0.1:{api.port}/api/sinks/nope/messages")
    assert code == 404


def test_messages_rest_not_enabled(queue):
    registry = ConfigRegistry()
    srv = ConfigApiServer(registry=registry).start()
    try:
        code, _ = _get(
            f"http://127.0.0.1:{srv.port}/api/sinks/x/messages")
        assert code == 404
    finally:
        srv.stop()
