"""Consumer supervisor — reconcile applied config into running streams.

Reference: the OTP supervision tree starts one Broadway pipeline per
SinkConsumer and restarts/stops them as consumers are created, updated
or deleted (lib/sequin/runtime/supervisor.ex — ConsumersSupervisor
child specs derive from the consumer registry; yaml apply →
Consumers.create/update → runtime restart). This is the Spark-side
equivalent: a reconciler that diffs the desired state (the
ConfigRegistry's applied consumers, with function references resolved)
against the running StreamingQuery set and starts / stops / restarts
to converge.

Semantics:

* new consumer        → start a ConsumerPipeline stream
* deleted consumer    → stop its query (checkpoint + ledger state stay
                        on disk, so a re-created consumer of the same
                        name resumes exactly-once)
* changed consumer    → stop + start (Structured Streaming queries are
                        immutable once started; the checkpoint carries
                        the source offset forward so no events are lost
                        or re-delivered)
* crashed query       → restarted on the next reconcile (the
                        one-for-one supervisor restart)

``reconcile()`` is idempotent and cheap when nothing changed — call it
after every config apply, or on a timer.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from sequin_spark.plans.spec import ConsumerSpec, to_external


@dataclass
class _Running:
    spec_fingerprint: str
    query: object  # StreamingQuery
    pipeline: object  # ConsumerPipeline


def _fingerprint(spec: ConsumerSpec) -> str:
    """Restart-deciding identity: the full external form (resolved
    function code included, so editing a referenced function restarts
    its consumers like the reference's runtime does)."""
    import hashlib
    import json

    ext = to_external(spec, show_sensitive=True)
    return hashlib.sha256(
        json.dumps(ext, sort_keys=True, default=str).encode()).hexdigest()


class ConsumerSupervisor:
    def __init__(self, spark, registry, stream_factory,
                 state_root: str, checkpoint_root: str,
                 tracer=None, trigger_seconds: int = 1):
        """``registry``: plans.config_api.ConfigRegistry (desired state;
        function references resolved via resolved_consumer).
        ``stream_factory``: () -> streaming DataFrame of canonical
        events — called once per started query (each query needs its
        own source instance, like one replication slot fan-out)."""
        self.spark = spark
        self.registry = registry
        self.stream_factory = stream_factory
        self.state_root = state_root
        self.checkpoint_root = checkpoint_root
        self.tracer = tracer
        self.trigger_seconds = trigger_seconds
        self.running: dict[str, _Running] = {}
        self._lock = threading.Lock()

    # -- lifecycle ----------------------------------------------------------

    def _start(self, spec: ConsumerSpec) -> _Running:
        from sequin_spark.streaming.pipeline import ConsumerPipeline

        pipe = ConsumerPipeline(
            spec,
            state_dir=f"{self.state_root}/{spec.name}",
            tracer=self.tracer,
        )
        query = pipe.start_stream(
            self.stream_factory(),
            checkpoint_dir=f"{self.checkpoint_root}/{spec.name}",
            trigger_seconds=self.trigger_seconds,
        )
        return _Running(_fingerprint(spec), query, pipe)

    @staticmethod
    def _stop(running: _Running) -> None:
        try:
            running.query.stop()
        except Exception:  # noqa: BLE001 — already dead is fine
            pass

    def reconcile(self) -> dict:
        """Converge running queries to the registry; returns the action
        summary {started: [...], stopped: [...], restarted: [...]}."""
        started, stopped, restarted = [], [], []
        with self._lock:
            desired: dict[str, ConsumerSpec] = {}
            for name in list(self.registry.consumers):
                spec = self.registry.resolved_consumer(name)
                if spec is not None:
                    desired[name] = spec
            # stop deleted
            for name in list(self.running):
                if name not in desired:
                    self._stop(self.running.pop(name))
                    stopped.append(name)
            for name, spec in desired.items():
                current = self.running.get(name)
                fp = _fingerprint(spec)
                if current is None:
                    self.running[name] = self._start(spec)
                    started.append(name)
                elif current.spec_fingerprint != fp:
                    self._stop(current)
                    self.running[name] = self._start(spec)
                    restarted.append(name)
                elif not current.query.isActive:
                    # one-for-one restart of a crashed query
                    self.running[name] = self._start(spec)
                    restarted.append(name)
        return {"started": started, "stopped": stopped,
                "restarted": restarted}

    def process_all_available(self) -> None:
        """Test/drain helper: block until every running query has
        consumed its available input."""
        with self._lock:
            queries = [r.query for r in self.running.values()]
        for q in queries:
            q.processAllAvailable()

    def shutdown(self) -> None:
        with self._lock:
            for name in list(self.running):
                self._stop(self.running.pop(name))
