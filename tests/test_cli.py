"""CLI e2e: `sequin` driving the in-process REST API.

Mirrors the reference Go CLI surface (cli/main.go:30-35 command groups;
cli/cli/context_command.go context verbs; cli/cli/config_command.go
plan/apply/export/interpolate incl. the literal-'yes' confirmation;
cli/config/config.go YAML preprocessing — envsubst everywhere except
``code`` values, ``functions.file`` inlining)."""

import io
import json
import time

import pytest

from sequin_spark.cli import main
from sequin_spark.plans.apikeys_api import ApiKeyRegistry
from sequin_spark.plans.config_api import ConfigApiServer, ConfigRegistry


def run_cli(*argv):
    out = io.StringIO()
    rc = main(list(argv), out=out)
    return rc, out.getvalue()


@pytest.fixture(autouse=True)
def _ctx_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("SEQUIN_CONTEXT_DIR", str(tmp_path / "contexts"))


@pytest.fixture()
def api():
    server = ConfigApiServer(ConfigRegistry()).start()
    yield server
    server.stop()


def _add_local_context(port, name="local", extra=()):
    rc, _ = run_cli("context", "add", name,
                    "--hostname", f"127.0.0.1:{port}",
                    "--api-token", "tok-123", *extra)
    assert rc == 0


# -- context verbs (context_command.go:28-75) -------------------------------

def test_context_add_ls_info_select_rm(api):
    _add_local_context(api.port, "dev")
    _add_local_context(api.port, "prod", extra=("--set-default",))
    rc, out = run_cli("context", "ls")
    assert rc == 0
    lines = out.strip().splitlines()
    assert any(line.startswith("*") and "prod" in line for line in lines)
    assert any("dev" in line for line in lines)

    # info redacts the token (show alias works too)
    rc, out = run_cli("context", "info", "dev")
    info = json.loads(out)
    assert info["api_token"].startswith("****")
    # local hostname ⇒ plain HTTP (context_command.go:100-107)
    assert info["tls"] is False

    rc, _ = run_cli("context", "select", "dev")
    assert rc == 0
    rc, out = run_cli("context", "ls")
    assert any(line.startswith("*") and "dev" in line
               for line in out.splitlines())

    rc, _ = run_cli("context", "rm", "prod")
    assert rc == 0
    rc, out = run_cli("context", "ls")
    assert "prod" not in out


def test_context_tls_defaults_remote_vs_local():
    run_cli("context", "add", "remote", "--hostname", "api.example.com",
            "--api-token", "t")
    _, out = run_cli("context", "info", "remote")
    assert json.loads(out)["tls"] is True
    run_cli("context", "add", "lo", "--hostname", "localhost:4000",
            "--api-token", "t")
    _, out = run_cli("context", "info", "lo")
    assert json.loads(out)["tls"] is False


def test_context_missing_errors():
    rc, _ = run_cli("context", "info", "nope")
    assert rc == 1
    rc, _ = run_cli("context", "rm", "nope")
    assert rc == 1


# -- config plan/apply/export (config_command.go:27-60) ---------------------

YAML = """
consumers:
  - name: orders-webhook
    sink_type: http_push
    sink_config: {url: "http://example.test/hook"}
    batch_size: 10
  - name: noop
    sink_type: benchmark
"""


def test_config_plan_apply_export_cycle(api, tmp_path):
    _add_local_context(api.port)
    cfg = tmp_path / "sequin.yaml"
    cfg.write_text(YAML)

    rc, out = run_cli("config", "plan", str(cfg))
    assert rc == 0
    assert "create" in out and "2 change(s)" in out

    rc, out = run_cli("config", "apply", str(cfg), "--auto-approve")
    assert rc == 0
    assert "Applied 2 resources" in out and "Apply complete!" in out

    # idempotent: re-apply detects no changes and skips confirmation
    rc, out = run_cli("config", "apply", str(cfg), "--auto-approve")
    assert rc == 0 and "No changes detected" in out

    rc, out = run_cli("config", "export")
    assert rc == 0 and "orders-webhook" in out

    rc, out = run_cli("sinks", "list")
    assert rc == 0 and "orders-webhook" in out and "noop" in out

    rc, out = run_cli("sinks", "show", "orders-webhook")
    assert rc == 0
    shown = json.loads(out)
    assert shown["batch_size"] == 10

    rc, out = run_cli("sinks", "rm", "noop")
    assert rc == 0
    rc, out = run_cli("sinks", "list")
    assert "noop" not in out


def test_config_apply_requires_literal_yes(api, tmp_path, monkeypatch):
    """Only 'yes' confirms (config_command.go:77-85)."""
    _add_local_context(api.port)
    cfg = tmp_path / "sequin.yaml"
    cfg.write_text(YAML)
    monkeypatch.setattr("sys.stdin", io.StringIO("y\n"))
    rc, out = run_cli("config", "apply", str(cfg))
    assert rc == 1 and "Apply cancelled." in out
    # nothing committed
    rc, out = run_cli("sinks", "list")
    assert out.strip() == ""
    monkeypatch.setattr("sys.stdin", io.StringIO("yes\n"))
    rc, out = run_cli("config", "apply", str(cfg))
    assert rc == 0 and "Apply complete!" in out


def test_config_plan_invalid_yaml_errors(api, tmp_path):
    _add_local_context(api.port)
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("consumers:\n  - {name: x, sink_type: no_such_sink}\n")
    rc, _ = run_cli("config", "plan", str(cfg))
    assert rc == 1


# -- YAML preprocessing (config.go:117-258) ---------------------------------

def test_interpolate_envsubst_and_code_skip(tmp_path, monkeypatch):
    monkeypatch.setenv("HOOK_HOST", "hooks.internal")
    monkeypatch.delenv("MISSING_VAR", raising=False)
    cfg = tmp_path / "sequin.yaml"
    cfg.write_text(
        "consumers:\n"
        "  - name: $HOOK_HOST-sink\n"
        "    sink_type: http_push\n"
        "    sink_config:\n"
        "      url: http://${HOOK_HOST}/hook\n"
        "      region: ${MISSING_VAR:-us-east-1}\n"
        "functions:\n"
        "  - name: t1\n"
        "    code: 'record[\"x\"] == \"$HOOK_HOST\"'\n"
    )
    rc, out = run_cli("config", "interpolate", str(cfg))
    assert rc == 0
    import yaml

    doc = yaml.safe_load(out)
    consumer = doc["consumers"][0]
    assert consumer["name"] == "hooks.internal-sink"
    assert consumer["sink_config"]["url"] == "http://hooks.internal/hook"
    assert consumer["sink_config"]["region"] == "us-east-1"
    # code values are never substituted (config.go:129 skip rule)
    assert "$HOOK_HOST" in doc["functions"][0]["code"]


def test_interpolate_function_file_inlining(tmp_path):
    (tmp_path / "transform.py").write_text("record['id'] * 2\n")
    cfg = tmp_path / "sequin.yaml"
    cfg.write_text(
        "functions:\n"
        "  - name: doubler\n"
        "    file: transform.py\n"
    )
    out_path = tmp_path / "out.yaml"
    rc, _ = run_cli("config", "interpolate", str(cfg),
                    "--output", str(out_path))
    assert rc == 0
    import yaml

    doc = yaml.safe_load(out_path.read_text())
    fn = doc["functions"][0]
    assert fn["code"] == "record['id'] * 2\n"
    assert "file" not in fn


def test_interpolate_missing_file_errors(tmp_path):
    cfg = tmp_path / "sequin.yaml"
    cfg.write_text("functions:\n  - {name: x, file: nope.py}\n")
    rc, _ = run_cli("config", "interpolate", str(cfg))
    assert rc == 1


# -- bearer auth (the :api pipeline token gate) -----------------------------

def test_cli_sends_bearer_token():
    keys = ApiKeyRegistry()
    key = keys.create("cli-key")
    server = ConfigApiServer(ConfigRegistry(), api_keys=keys,
                             require_auth=True).start()
    try:
        run_cli("context", "add", "auth", "--hostname",
                f"127.0.0.1:{server.port}", "--api-token", key.token)
        rc, _ = run_cli("sinks", "list")
        assert rc == 0
        # wrong token → 401 surfaced as CLI error
        run_cli("context", "add", "bad", "--hostname",
                f"127.0.0.1:{server.port}", "--api-token", "wrong",
                "--set-default")
        rc, _ = run_cli("sinks", "list")
        assert rc == 1
    finally:
        server.stop()


# -- backfills create/pause/resume/cancel (backfill_controller.ex) ----------

@pytest.fixture()
def backfill_api(spark):
    from sequin_spark.operators.source_filter import Source
    from sequin_spark.plans.backfill_api import BackfillManager
    from sequin_spark.plans.spec import ConsumerSpec

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
    mgr = BackfillManager(resolver, initial_page_size=100, throttle_ms=300)
    srv = ConfigApiServer(registry=registry, backfills=mgr).start()
    try:
        yield srv
    finally:
        srv.stop()
        df.unpersist()


def test_backfills_cli_lifecycle(backfill_api):
    _add_local_context(backfill_api.port)
    rc, out = run_cli("backfills", "create", "--sink", "customers-sink",
                      "--table", "public.customer")
    assert rc == 0
    job = json.loads(out)
    assert job["state"] == "active"
    bf_id = job["id"]

    rc, out = run_cli("backfills", "pause", "--sink", "customers-sink",
                      bf_id)
    assert rc == 0 and "paused" in out

    rc, out = run_cli("backfills", "list", "--sink", "customers-sink",
                      "--json")
    assert rc == 0
    assert json.loads(out)[0]["state"] == "paused"

    rc, out = run_cli("backfills", "resume", "--sink", "customers-sink",
                      bf_id)
    assert rc == 0

    # completes eventually after resume
    deadline = time.time() + 30
    state = None
    while time.time() < deadline:
        _, out = run_cli("backfills", "show", "--sink", "customers-sink",
                         bf_id)
        state = json.loads(out)["state"]
        if state == "completed":
            break
        time.sleep(0.2)
    assert state == "completed"

    # cancel from terminal state is an invalid transition → 422 → rc 1
    rc, _ = run_cli("backfills", "cancel", "--sink", "customers-sink",
                    bf_id)
    assert rc == 1


def test_backfills_cli_unknown_sink(backfill_api):
    _add_local_context(backfill_api.port)
    rc, _ = run_cli("backfills", "create", "--sink", "nope",
                    "--table", "public.customer")
    assert rc == 1


# -- messages verbs (pull consume + browse over the management API) ---------

def test_messages_receive_ack_peek_cli(spark, tmp_path):
    from sequin_spark.plans.messages_api import MessageBrowser
    from sequin_spark.plans.spec import ConsumerSpec
    from sequin_spark.streaming.pull_queue import PullQueue

    df = spark.createDataFrame(
        [(f"g{i}", 100 + i, 0, json.dumps({"n": i})) for i in range(5)],
        "group_id string, commit_lsn long, commit_idx long, value string",
    )
    queue = PullQueue(str(tmp_path / "pq"), ack_wait_s=30.0)
    queue.ingest(df)
    registry = ConfigRegistry()
    registry.apply([ConsumerSpec(name="orders-pull",
                                 sink_type="sequin_stream")])
    srv = ConfigApiServer(
        registry=registry, pull={"orders-pull": queue},
        messages={"orders-pull": MessageBrowser(queue=queue)}).start()
    try:
        _add_local_context(srv.port)
        rc, out = run_cli("messages", "receive", "--sink", "orders-pull",
                          "--batch-size", "3")
        assert rc == 0
        leased = json.loads(out)
        assert len(leased) == 3
        ack_ids = [m["ack_id"] for m in leased]
        # nack one, ack two
        rc, out = run_cli("messages", "nack", "--sink", "orders-pull",
                          ack_ids[0])
        assert rc == 0 and "nacked 1" in out
        rc, out = run_cli("messages", "ack", "--sink", "orders-pull",
                          *ack_ids[1:])
        assert rc == 0 and "acked 2" in out
        # peek shows remaining depth (5 - 2 acked = 3)
        rc, out = run_cli("messages", "peek", "--sink", "orders-pull",
                          "--json")
        assert rc == 0 and len(json.loads(out)) == 3
        # unknown sink → error exit
        rc, _ = run_cli("messages", "receive", "--sink", "nope")
        assert rc == 1
    finally:
        srv.stop()


# -- sinks add / edit (consumer_command.go:35,86 analogs) -------------------

def test_sinks_add_and_edit(api, tmp_path):
    _add_local_context(api.port)
    spec = tmp_path / "sink.json"
    spec.write_text(json.dumps({
        "name": "cli-made",
        "sink_type": "benchmark",
        "batch_size": 5,
    }))
    rc, out = run_cli("sinks", "add", "--file", str(spec))
    assert rc == 0 and "created" in out

    # --set overrides the file field (JSON-parsed value)
    rc, out = run_cli("sinks", "add", "--file", str(spec),
                      "--set", "name=cli-made-2", "--set", "batch_size=25")
    assert rc == 0
    rc, out = run_cli("sinks", "show", "cli-made-2")
    assert json.loads(out)["batch_size"] == 25

    # duplicate name → API 422 surfaces as CLI failure
    rc, out = run_cli("sinks", "add", "--file", str(spec))
    assert rc == 1

    rc, out = run_cli("sinks", "edit", "cli-made", "--set", "batch_size=99")
    assert rc == 0 and "updated" in out
    rc, out = run_cli("sinks", "show", "cli-made")
    assert json.loads(out)["batch_size"] == 99

    # edit of a missing sink → 404 → failure
    rc, _ = run_cli("sinks", "edit", "ghost", "--set", "batch_size=1")
    assert rc == 1
    # no payload at all → CLI-side error
    rc, _ = run_cli("sinks", "edit", "cli-made")
    assert rc == 1


# -- index build / info -----------------------------------------------------

def test_index_build_and_info(tmp_path):
    dest = str(tmp_path / "pqidx")
    rc, out = run_cli("index", "build", "--kind", "pq",
                      "--corpus", "/root/testdata/sf0.001/embeddings.parquet",
                      "--dest", dest, "--m", "4", "--ksub", "4")
    assert rc == 0 and "written" in out

    rc, out = run_cli("index", "info", dest)
    assert rc == 0
    info = json.loads(out)
    assert info["complete"] is True
    assert info["subspaces"] == 4 and info["ksub"] == 4
    assert info["parts"]["codes"]["files"] >= 1

    # incomplete dir → complete: false
    rc, out = run_cli("index", "info", str(tmp_path / "nothing"))
    assert rc == 0 and json.loads(out)["complete"] is False
