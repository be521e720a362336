"""Streaming metrics — the Prometheus-surface analog.

Reference: lib/sequin/metrics/prometheus.ex exposes per-consumer
throughput/latency counters. Spark's StreamingQueryListener delivers the
same signals per micro-batch (input rows, processed rows/s, batch
duration); we fold them into a driver-side registry that a scrape
endpoint (or test) can read.
"""

from __future__ import annotations

import json
from collections import defaultdict

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    def __init__(self):
        self.progress: dict[str, list[dict]] = defaultdict(list)
        self.totals: dict[str, dict] = defaultdict(
            lambda: {"batches": 0, "rows": 0, "duration_ms": 0}
        )

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = json.loads(event.progress.json)
        name = p.get("name") or p["id"]
        self.progress[name].append(p)
        t = self.totals[name]
        t["batches"] += 1
        t["rows"] += p.get("numInputRows", 0)
        t["duration_ms"] += p.get("durationMs", {}).get("triggerExecution", 0)

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def snapshot(self) -> dict:
        out = {}
        for name, t in self.totals.items():
            dur_s = t["duration_ms"] / 1000.0
            out[name] = {
                **t,
                "rows_per_sec": (t["rows"] / dur_s) if dur_s > 0 else 0.0,
            }
        return out
