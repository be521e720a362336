"""Per-entity health: latest-event-per-slug folding → entity status.

Reference: lib/sequin/health/health.ex (entity status ∈ healthy |
warning | error | initializing | waiting | paused, health.ex:65;
computed from per-slug checks) and health/event.ex (events unique by
slug per entity, statuses success | fail | warning | info,
event.ex:25-28; only the LATEST event per slug is kept, folding
last_success_at / last_fail_at / in_status_since timestamps,
event.ex:3-13,75-96). Slug vocabulary for sink consumers:
event.ex:43-59 (messages_ingested / messages_delivered /
messages_pending_delivery / load_shedding_policy_discarded, ...).

The reference persists folded events in Redis; we hold them on the
entity (driver-side — health is O(slugs), never O(messages)) and feed
them from delivery stats, the exact signals the reference's pipelines
emit from Broadway callbacks.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

STATUSES = ("success", "fail", "warning", "info")
ENTITY_STATUSES = ("healthy", "warning", "error", "initializing", "waiting", "paused")


@dataclass
class HealthEvent:
    slug: str
    status: str = "success"
    error: str | None = None
    last_event_at: float = 0.0
    last_success_at: float | None = None
    last_fail_at: float | None = None
    in_status_since: float = 0.0

    def fold(self, status: str, error: str | None, now: float) -> None:
        """Latest-event folding (event.ex:5-13): keep one record per
        slug, roll the per-status timestamps."""
        if status != self.status:
            self.in_status_since = now
        self.status = status
        self.error = error if status in ("fail", "warning") else None
        self.last_event_at = now
        if status == "success":
            self.last_success_at = now
        elif status == "fail":
            self.last_fail_at = now


@dataclass
class Health:
    """One entity's health (a consumer, a pipeline, a backfill)."""

    entity_id: str
    expected_slugs: tuple[str, ...] = ()
    paused: bool = False
    events: dict[str, HealthEvent] = field(default_factory=dict)

    def put_event(self, slug: str, status: str = "success", error: str | None = None) -> None:
        if status not in STATUSES:
            raise ValueError(f"unknown event status {status!r}")
        now = time.time()
        ev = self.events.get(slug)
        if ev is None:
            ev = self.events[slug] = HealthEvent(slug=slug, status=status, in_status_since=now)
        ev.fold(status, error, now)

    def status(self) -> str:
        """Entity status (health.ex:65 vocabulary): paused wins; any
        failing check → error; any warning → warning; expected checks
        not yet seen → initializing; else healthy."""
        if self.paused:
            return "paused"
        evs = self.events.values()
        if any(e.status == "fail" for e in evs):
            return "error"
        if any(e.status == "warning" for e in evs):
            return "warning"
        if any(s not in self.events for s in self.expected_slugs):
            return "initializing"
        return "healthy"

    def snapshot(self) -> dict:
        """get_snapshot analog (health.ex:1117): status + per-check facts."""
        return {
            "entity_id": self.entity_id,
            "status": self.status(),
            "checks": {
                s: {
                    "status": e.status,
                    "error": e.error,
                    "last_success_at": e.last_success_at,
                    "last_fail_at": e.last_fail_at,
                    "in_status_since": e.in_status_since,
                }
                for s, e in sorted(self.events.items())
            },
        }

    # --- the delivery-stats bridge ---------------------------------------
    def observe_batch(self, stats: dict) -> None:
        """Fold one process_batch stats dict into health events — the
        signals the reference emits from its Broadway ack callbacks
        (event.ex:43-59 slugs)."""
        self.put_event("messages_ingested", "success")
        if stats.get("failed", 0) or stats.get("discarded", 0):
            self.put_event(
                "messages_delivered", "fail",
                f"failed={stats.get('failed', 0)} discarded={stats.get('discarded', 0)}",
            )
        elif stats.get("delivered", 0):
            self.put_event("messages_delivered", "success")
        pending = stats.get("pending", 0)
        self.put_event(
            "messages_pending_delivery",
            "warning" if pending > 0 else "info",
            f"pending={pending}" if pending else None,
        )
        if stats.get("shed", 0):
            self.put_event("load_shedding_policy_discarded", "warning",
                           f"shed={stats['shed']}")
