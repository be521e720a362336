"""Per-consumer trace events — the console trace tab's data source.

Reference: lib/sequin/runtime/trace.ex — ``Trace.Event`` records
(status info|warning|error, message, req_request/req_response
summaries, error, extra map, published_at) broadcast per consumer over
Phoenix PubSub (topic ``sequin:trace:<consumer_id>``) and rendered by
the console's trace tab (sink_consumers/show.ex:160,273 ``:trace``
action / ``encode_trace``). Delivery pipelines publish at every
delivery attempt, e.g. http_push_pipeline.ex:177-207 "Messages
delivered to HTTP endpoint" / "Failed to deliver messages to HTTP
endpoint" with the request and response attached.

This engine's twin: an in-process pub/sub with a bounded ring per
consumer (the console only ever shows a recent window; an unbounded
trace of a 50k-rows/s stream would be a memory leak), driver-side.
Executor-side sink calls can't publish to a driver ring, so the
DeliveryEngine publishes batch-granular events from the per-batch
summary it already collects — counts, latency, failure errors — which
is the same information the console aggregates, at the granularity the
Spark execution model exposes honestly.

REST surface: ``GET /api/sinks/:name/trace`` on the config API serves
the ring (newest first, ``limit``/``status`` filters).
"""

from __future__ import annotations

import threading
import time
from collections import deque
from dataclasses import dataclass, field


@dataclass
class TraceEvent:
    """trace.ex Event parity: to_external renders req/resp summaries
    as plain dicts and the error as a string."""

    status: str  # info | warning | error
    message: str
    req_request: dict | None = None
    req_response: dict | None = None
    error: str | None = None
    extra: dict = field(default_factory=dict)
    published_at: float = 0.0

    def to_external(self) -> dict:
        return {
            "status": self.status,
            "message": self.message,
            "req_request": self.req_request,
            "req_response": self.req_response,
            "error": self.error,
            "extra": self.extra,
            "published_at": self.published_at,
        }


class Tracer:
    """Bounded per-consumer trace rings + subscriptions (the PubSub
    topic per consumer, trace.ex:109-171)."""

    def __init__(self, ring_size: int = 200):
        self.ring_size = ring_size
        self._rings: dict[str, deque[TraceEvent]] = {}
        self._subs: dict[str, list] = {}
        self._lock = threading.Lock()

    # -- publish (trace.ex info/warning/error) ------------------------------

    def publish(self, consumer_id: str | None, event: TraceEvent) -> None:
        if consumer_id is None:  # publish(nil, _) → :ok
            return
        event.published_at = event.published_at or time.time()
        with self._lock:
            ring = self._rings.setdefault(
                consumer_id, deque(maxlen=self.ring_size))
            ring.append(event)
            subs = list(self._subs.get(consumer_id, ()))
        for fn in subs:
            try:
                fn(event)
            except Exception:  # noqa: BLE001 — subscriber bugs don't break delivery
                pass

    def info(self, consumer_id: str | None, message: str, **fields) -> None:
        self.publish(consumer_id, TraceEvent("info", message, **fields))

    def warning(self, consumer_id: str | None, message: str, **fields) -> None:
        self.publish(consumer_id, TraceEvent("warning", message, **fields))

    def error(self, consumer_id: str | None, message: str, **fields) -> None:
        self.publish(consumer_id, TraceEvent("error", message, **fields))

    # -- subscribe (trace.ex subscribe/unsubscribe) -------------------------

    def subscribe(self, consumer_id: str, fn) -> None:
        with self._lock:
            self._subs.setdefault(consumer_id, []).append(fn)

    def unsubscribe(self, consumer_id: str, fn) -> None:
        with self._lock:
            subs = self._subs.get(consumer_id, [])
            if fn in subs:
                subs.remove(fn)

    # -- read (the trace tab's window) --------------------------------------

    def events(self, consumer_id: str, limit: int = 50,
               status: str | None = None) -> list[TraceEvent]:
        """Newest first (the console prepends incoming events)."""
        with self._lock:
            ring = list(self._rings.get(consumer_id, ()))
        if status is not None:
            ring = [e for e in ring if e.status == status]
        return list(reversed(ring))[: int(limit)]
