"""Function tester — run a function against captured or synthetic
messages, the console's function-editor test panel.

Reference: lib/sequin/functions/test_messages.ex (a per-(database,
table) capped capture ring — max 10 messages (:18), add/get/delete,
plus a needs-messages registry the replication pipeline consults to
know when to siphon real events) and
lib/sequin_web/live/functions/edit.ex:246-380 (poll captured messages,
run the edited function against each + a synthetic fallback message,
render per-message results/errors).

Spark-side: messages are plain dicts shaped like the canonical event
(action / record / changes / metadata); ``run_function`` builds a tiny
DataFrame and applies the SAME compilation paths the pipeline uses
(MiniPy expr/program, path functions, routing dict literals), so what
the tester shows is exactly what the pipeline will do.
"""

from __future__ import annotations

import threading
from collections import OrderedDict

MAX_MESSAGE_COUNT = 10  # test_messages.ex:18


class TestMessages:
    """Capped per-(database_id, table_oid) capture ring
    (test_messages.ex:62-120)."""

    __test__ = False  # not a pytest class despite the reference's name

    def __init__(self):
        self._store: dict[tuple, list[dict]] = {}
        self._needs: OrderedDict[str, bool] = OrderedDict()
        self._lock = threading.Lock()

    @staticmethod
    def max_message_count() -> int:
        return MAX_MESSAGE_COUNT

    def add_test_message(self, database_id: str, table_oid: int,
                         message: dict) -> bool:
        """False when the ring is full (add_test_message/2:67-76)."""
        with self._lock:
            msgs = self._store.setdefault((database_id, table_oid), [])
            if len(msgs) >= MAX_MESSAGE_COUNT:
                return False
            msgs.append(message)
            return True

    def get_test_messages(self, database_id: str,
                          table_oid: int) -> list[dict]:
        with self._lock:
            return list(self._store.get((database_id, table_oid), []))

    def delete_test_message(self, database_id: str, table_oid: int,
                            trace_id: str) -> bool:
        with self._lock:
            msgs = self._store.get((database_id, table_oid), [])
            for i, m in enumerate(msgs):
                if m.get("metadata", {}).get("trace_id") == trace_id:
                    msgs.pop(i)
                    return True
            return False

    def delete_test_messages(self, database_id: str,
                             table_oid: int) -> None:
        with self._lock:
            self._store.pop((database_id, table_oid), None)

    # -- needs-messages registry (test_messages.ex:34-41): the pipeline
    # only siphons capture copies while an editor session is live
    def register_needs_messages(self, database_id: str) -> None:
        with self._lock:
            self._needs[database_id] = True

    def unregister_needs_messages(self, database_id: str) -> None:
        with self._lock:
            self._needs.pop(database_id, None)

    def needs_messages(self, database_id: str) -> bool:
        with self._lock:
            return database_id in self._needs


def synthetic_message() -> dict:
    """Consumers.synthetic_message analog: a deterministic sample event
    so the tester works before any real traffic is captured."""
    return {
        "action": "insert",
        "record": {"id": "1", "name": "Paul Atreides",
                   "house": "Atreides", "planet": "Arrakis"},
        "changes": None,
        "metadata": {
            "table_schema": "public", "table_name": "characters",
            "commit_lsn": "309018972710", "commit_idx": "0",
            "trace_id": "synthetic-0000", "consumer_name": "tester",
        },
    }


def run_function(spark, ftype: str, code: str,
                 messages: list[dict] | None = None) -> list[dict]:
    """Apply a function to each message; returns per-message
    ``{"trace_id", "result"}`` (or a dict with "error" when the code
    fails to compile/validate). Uses the pipeline's own compilation:

    * transform — MiniPy expression/program, ``path:...``, or the
      default/record_only shapes
    * filter    — MiniPy predicate → bool
    * routing   — dict literal → one value per routing key
    """
    from pyspark.sql import functions as F

    from sequin_spark.functions.minipy import compile_expr
    from sequin_spark.functions.path import path_function

    msgs = messages or [synthetic_message()]

    rows = []
    for i, m in enumerate(msgs):
        rows.append((
            i,
            m.get("action", "insert"),
            {k: (None if v is None else str(v))
             for k, v in (m.get("record") or {}).items()},
            ({k: (None if v is None else str(v))
              for k, v in m["changes"].items()}
             if isinstance(m.get("changes"), dict) else None),
            {k: (None if v is None else str(v))
             for k, v in (m.get("metadata") or {}).items()},
        ))
    df = spark.createDataFrame(
        rows,
        "_i int, action string, record map<string,string>, "
        "changes map<string,string>, metadata map<string,string>",
    )

    try:
        if ftype == "transform":
            if code == "default":
                col = F.to_json(F.struct("record", "changes", "action",
                                         "metadata"))
            elif code == "record_only":
                col = F.to_json(F.col("record"))
            elif code.startswith("path:"):
                col = path_function(code[len("path:"):]).cast("string")
            else:
                col = compile_expr(code).cast("string")
            out = df.select("_i", col.alias("result"))
        elif ftype == "filter":
            out = df.select(
                "_i", compile_expr(code).cast("boolean").alias("result"))
        elif ftype == "routing":
            from sequin_spark.plans.spec import routing_dict_sources

            parts = routing_dict_sources(code)
            out = df.select(
                "_i",
                F.to_json(F.struct(*[
                    compile_expr(src).alias(key)
                    for key, src in parts.items()
                ])).alias("result"),
            )
        else:
            raise ValueError(f"unknown function type {ftype!r}")
        collected = {r["_i"]: r["result"] for r in out.collect()}
    except Exception as e:  # noqa: BLE001 — compile/analysis errors
        return [{"error": str(e)[:500]}]

    results = []
    for i, m in enumerate(msgs):
        results.append({
            "trace_id": (m.get("metadata") or {}).get("trace_id"),
            "result": collected.get(i),
        })
    return results
