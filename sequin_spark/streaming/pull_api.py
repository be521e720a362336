"""HTTP pull API — the `sequin_stream` consume surface over PullQueue.

Reference: lib/sequin_web/controllers/pull_controller.ex:14-53 (receive/
ack/nack actions), router.ex:180-189 (both `/sequin_streams/...` and the
legacy `/http_pull_consumers/...` prefixes), pull_json.ex (receive
renders ``{"data": [{"ack_id": ..., "data": ...}, ...]}``), with the
controller's parameter contract: ``max_batch_size`` 1..1000 (legacy
alias ``batch_size``, default 1), ``wait_for`` long-poll 500ms..5min
accepting millis or duration strings ('60s', '5m', '1000ms'
— pull_controller.ex:75-131), ``ack_ids`` a non-empty list of UUID
strings (pull_controller.ex:55-73).

stdlib http.server only (like the fake-sink test servers) — one
PullApiServer fronts named PullQueues; the queue itself does the
group-blocking / visibility / redelivery semantics. At scale this shim
is the stateless edge; queues shard by group hash behind it.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from sequin_spark.streaming.pull_queue import PullQueue

_UUIDISH = re.compile(r"^[0-9a-fA-F-]{32,36}$")
_ROUTE = re.compile(
    r"^/api/(?:sequin_streams|http_pull_consumers)/([^/]+)/(receive|ack|nack)$"
)
MAX_WAIT_MS = 300_000
MIN_WAIT_MS = 500


def parse_duration_ms(v) -> int | None:
    """'60s' / '5m' / '1000ms' / number → millis (Time.parse_duration)."""
    if isinstance(v, (int, float)):
        return int(v)
    m = re.fullmatch(r"(\d+)(ms|s|m)", str(v).strip())
    if not m:
        return None
    n, unit = int(m.group(1)), m.group(2)
    return n * {"ms": 1, "s": 1000, "m": 60_000}[unit]


class PullRouter:
    """The receive/ack/nack controller logic, shared by the standalone
    PullApiServer and the management ConfigApiServer (router.ex mounts
    the pull routes on the same :api scope, router.ex:180-189)."""

    def __init__(self, queues: dict[str, PullQueue] | None = None):
        self.queues = dict(queues or {})
        self._lock = threading.Lock()

    def handle(self, name: str, action: str, params: dict) -> tuple[int, dict]:
        """(status, payload) for one pull-API call."""
        queue = self.queues.get(name)
        if queue is None:
            return 404, {"error": f"no sequin_stream consumer {name!r}"}
        try:
            return 200, self._dispatch(queue, action, params)
        except _BadRequest as e:
            return 400, {"error": str(e)}

    # --- controller actions ----------------------------------------------
    def _dispatch(self, queue: PullQueue, action: str, params: dict) -> dict:
        # The server lock guards only the actual queue mutation. Long-poll
        # waiting must happen OUTSIDE it: a receive with wait_for=5m holding
        # the server-wide lock would stall every other client's
        # receive/ack/nack — including the very nack that would make a
        # message deliverable for the waiter.
        if action == "receive":
            batch_size = self._parse_batch_size(params)
            self._maybe_wait(queue, params)
            with self._lock:
                return {"data": queue.receive(batch_size)}
        ack_ids = params.get("ack_ids")
        if (
            not isinstance(ack_ids, list)
            or not ack_ids
            or not all(isinstance(a, str) and _UUIDISH.match(a) for a in ack_ids)
        ):
            raise _BadRequest(
                "Invalid ack_ids. Must send a top-level `ack_ids` property "
                "that is a non-empty list of valid UUID strings"
            )
        with self._lock:
            if action == "ack":
                queue.ack(ack_ids)
            else:
                queue.nack(ack_ids)
        return {"success": True}

    @staticmethod
    def _parse_batch_size(params: dict) -> int:
        raw = params.get("max_batch_size", params.get("batch_size"))  # legacy alias
        if raw is None:
            return 1
        try:
            n = int(raw)
        except (TypeError, ValueError):
            n = 0
        if not 1 <= n <= 1000:
            raise _BadRequest(
                "Invalid `max_batch_size`. `max_batch_size` must be an "
                "integer between 1 and 1000."
            )
        return n

    def _maybe_wait(self, queue: PullQueue, params: dict) -> None:
        """Long-poll: block up to wait_for ms until a message is available
        (pull_controller.ex:92-131; polls instead of OTP mailbox wakeups)."""
        import time

        if "wait_for" not in params:
            return
        ms = parse_duration_ms(params["wait_for"])
        if ms is None or not MIN_WAIT_MS <= ms <= MAX_WAIT_MS:
            raise _BadRequest(
                "Invalid `wait_for`. Must be between 500 and 300,000 "
                "milliseconds, or use duration format like '60s', '5m', '1000ms'."
            )
        deadline = time.time() + ms / 1000.0
        while queue.depth() == 0 and time.time() < deadline:
            time.sleep(0.05)


class PullApiServer:
    """Standalone HTTP server over a PullRouter."""

    def __init__(self, queues: dict[str, PullQueue], host: str = "127.0.0.1", port: int = 0):
        self.router = PullRouter(queues)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # silence
                pass

            def _json(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _handle(self, params: dict) -> None:
                m = _ROUTE.match(self.path.split("?")[0])
                if not m:
                    return self._json(404, {"error": "not found"})
                status, payload = outer.router.handle(m.group(1), m.group(2), params)
                self._json(status, payload)

            def do_GET(self):  # noqa: N802 - receive is also GET (router.ex:181)
                from urllib.parse import parse_qsl, urlsplit

                params = dict(parse_qsl(urlsplit(self.path).query))
                self._handle(params)

            def do_POST(self):  # noqa: N802
                n = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(n) if n else b"{}"
                try:
                    params = json.loads(raw or b"{}")
                except json.JSONDecodeError:
                    return self._json(400, {"error": "invalid JSON body"})
                self._handle(params if isinstance(params, dict) else {})

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    @property
    def queues(self):
        return self.router.queues

    def start(self) -> "PullApiServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    def url(self, name: str, action: str) -> str:
        return f"http://127.0.0.1:{self.port}/api/sequin_streams/{name}/{action}"


class _BadRequest(ValueError):
    pass
