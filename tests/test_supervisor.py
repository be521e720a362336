"""ConsumerSupervisor: applied config → running streams, reconciled
(the OTP ConsumersSupervisor semantics — start on create, stop on
delete, restart on update/crash — over Structured Streaming queries)."""

import json

from sequin_spark.cdc import eventize_orders
from sequin_spark.plans.config_api import ConfigRegistry
from sequin_spark.plans.spec import load_config
from sequin_spark.streaming.supervisor import ConsumerSupervisor


def _yaml(out_a, out_b=None, batch_size=None):
    doc = (
        "consumers:\n"
        f"  - name: log-a\n"
        f"    sink_type: file_log\n"
        f"    sink_config: {{path: \"{out_a}\"}}\n"
        f"    transform: record_only\n"
    )
    if batch_size:
        doc += f"    batch_size: {batch_size}\n"
    if out_b:
        doc += (
            f"  - name: log-b\n"
            f"    sink_type: file_log\n"
            f"    sink_config: {{path: \"{out_b}\"}}\n"
            f"    actions: [delete]\n"
            f"    transform: record_only\n"
        )
    return doc


def _count(out_dir):
    if not out_dir.exists():
        return 0
    return sum(len(f.read_text().splitlines()) for f in out_dir.iterdir())


def test_reconcile_start_update_delete(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    ev = eventize_orders(spark, sf_dir).limit(80).localCheckpoint()
    ev.coalesce(1).write.mode("append").parquet(str(src))
    schema = ev.schema

    registry = ConfigRegistry()
    sup = ConsumerSupervisor(
        spark, registry,
        stream_factory=lambda: spark.readStream.schema(schema)
        .parquet(str(src)),
        state_root=str(tmp_path / "state"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    try:
        out_a, out_b = tmp_path / "out_a", tmp_path / "out_b"
        # apply two consumers → both start
        _, specs = load_config(_yaml(out_a, out_b))
        registry.apply(specs)
        actions = sup.reconcile()
        assert sorted(actions["started"]) == ["log-a", "log-b"]
        sup.process_all_available()
        n_deletes = ev.filter("action = 'delete'").count()
        assert _count(out_a) == 80
        assert _count(out_b) == n_deletes

        # idempotent: nothing changes → no actions
        assert sup.reconcile() == {
            "started": [], "stopped": [], "restarted": []}

        # update log-a (batch_size) → restarted; delete log-b → stopped
        _, specs2 = load_config(_yaml(out_a, batch_size=50))
        registry.apply(specs2)
        actions = sup.reconcile()
        assert actions["restarted"] == ["log-a"]
        assert actions["stopped"] == ["log-b"]
        assert not sup.running.get("log-b")

        # the restarted consumer resumes from its checkpoint: new input
        # delivers exactly once, no replay of the first 80
        from pyspark.sql import functions as F

        seen = [r["k"] for r in ev.select(
            F.col("record")["o_orderkey"].alias("k")).collect()]
        more = (eventize_orders(spark, sf_dir).limit(120)
                .filter(~F.col("record")["o_orderkey"].isin(seen))
                .localCheckpoint())
        n_more = more.count()
        more.coalesce(1).write.mode("append").parquet(str(src))
        sup.process_all_available()
        assert _count(out_a) == 80 + n_more
    finally:
        sup.shutdown()
    assert all(not r.query.isActive for r in sup.running.values())


def test_reconcile_restarts_crashed_query(spark, sf_dir, tmp_path):
    src = tmp_path / "src"
    ev = eventize_orders(spark, sf_dir).limit(10).localCheckpoint()
    ev.coalesce(1).write.mode("append").parquet(str(src))
    registry = ConfigRegistry()
    _, specs = load_config(_yaml(tmp_path / "out"))
    registry.apply(specs)
    sup = ConsumerSupervisor(
        spark, registry,
        stream_factory=lambda: spark.readStream.schema(ev.schema)
        .parquet(str(src)),
        state_root=str(tmp_path / "state"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    try:
        sup.reconcile()
        sup.process_all_available()
        # kill the query behind the supervisor's back → one-for-one restart
        sup.running["log-a"].query.stop()
        actions = sup.reconcile()
        assert actions["restarted"] == ["log-a"]
        assert sup.running["log-a"].query.isActive
    finally:
        sup.shutdown()
