"""Local-tunnel transport: reverse port-forwarding between the server
(bastion) and a user's machine.

Reference: the Go CLI tunnels with an embedded chisel client
(cli/cli/tunnel_command.go:70-100 — remotes of the form
``R:<bastion-port>:localhost:<local-port>``, auth ``notused:<api-token>``,
25 s keep-alive) to the server's chisel endpoint fronted by
lib/sequin_web/controllers/local_tunnel_controller.ex, which allocates
one bastion port per tunnel-enabled entity. Traffic addressed to the
bastion port on the server is piped to ``localhost:<local-port>`` on the
user's machine — that's how webhook sinks reach a dev laptop and how the
server reaches a laptop-local Postgres.

Chisel itself is SSH-over-WebSocket; with no SSH/WS dependencies in this
environment we implement the same *behavior* over a single TCP control
connection carrying length-prefixed multiplexed streams:

    handshake   client → server: one JSON line
                  {"token": ..., "entity": ..., "bastion_port": int|0}
                server → client: one JSON line
                  {"ok": true, "bastion_port": N} | {"ok": false, "error": ...}
    frames      !IBI header = payload-length, type, stream-id
                types: 0=OPEN 1=DATA 2=CLOSE 3=PING 4=PONG

On each inbound connection to the entity's bastion port the server
assigns a stream id, sends OPEN, and pipes bytes both ways; the client
dials ``localhost:<local-port>`` per OPEN and does the same. PING/PONG
every ``keepalive`` seconds mirrors chisel's KeepAlive (tunnel_command.go:75).
"""

from __future__ import annotations

import json
import socket
import struct
import threading
import time

_HEADER = struct.Struct("!IBI")  # payload_len, frame_type, stream_id
OPEN, DATA, CLOSE, PING, PONG = range(5)
_MAX_FRAME = 1 << 20


def _send_frame(sock: socket.socket, lock: threading.Lock,
                ftype: int, stream_id: int, payload: bytes = b"") -> None:
    with lock:
        sock.sendall(_HEADER.pack(len(payload), ftype, stream_id) + payload)


def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None
        buf += chunk
    return buf


def _recv_frame(sock: socket.socket):
    head = _recv_exact(sock, _HEADER.size)
    if head is None:
        return None
    length, ftype, stream_id = _HEADER.unpack(head)
    if length > _MAX_FRAME:
        raise ValueError(f"oversized tunnel frame: {length}")
    payload = _recv_exact(sock, length) if length else b""
    if length and payload is None:
        return None
    return ftype, stream_id, payload


def _pipe_to_frames(src: socket.socket, ctrl: socket.socket,
                    lock: threading.Lock, stream_id: int) -> None:
    """Read raw bytes from ``src`` and ship them as DATA frames until
    EOF, then CLOSE. Socket errors on either side end the stream."""
    try:
        while True:
            data = src.recv(65536)
            if not data:
                break
            _send_frame(ctrl, lock, DATA, stream_id, data)
    except OSError:
        pass
    try:
        _send_frame(ctrl, lock, CLOSE, stream_id)
    except OSError:
        pass


class TunnelServer:
    """Bastion side. One control connection per entity; a listening
    socket per tunnel whose traffic is multiplexed over that control
    connection (local_tunnel_controller.ex's per-entity bastion port)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 api_token: str | None = None, port_for=None):
        """``port_for(entity_id) -> int``: bastion-port allocator —
        pass ``lambda e: <port from plans.replication_api.local_tunnels>``
        to honor the resource's deterministic ports; default 0 picks an
        ephemeral port (reported back in the handshake)."""
        self.api_token = api_token
        self.port_for = port_for or (lambda entity: 0)
        self._ctrl_listener = socket.create_server((host, port))
        self.host, self.port = self._ctrl_listener.getsockname()[:2]
        self._threads: list[threading.Thread] = []
        self._bastions: dict[str, socket.socket] = {}
        self._stop = threading.Event()
        self._accept_thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "TunnelServer":
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True)
        self._accept_thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        try:
            self._ctrl_listener.close()
        except OSError:
            pass
        for sock in list(self._bastions.values()):
            try:
                sock.close()
            except OSError:
                pass

    def bastion_port(self, entity: str, timeout: float = 5.0) -> int:
        """Port serving ``entity``'s tunnel; waits for the client to
        connect (tests race the handshake)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            sock = self._bastions.get(entity)
            if sock is not None:
                return sock.getsockname()[1]
            time.sleep(0.01)
        raise TimeoutError(f"no tunnel established for entity {entity!r}")

    # -- control plane ------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._ctrl_listener.accept()
            except OSError:
                return
            t = threading.Thread(
                target=self._serve_client, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def _serve_client(self, ctrl: socket.socket) -> None:
        ctrl_file = ctrl.makefile("rb")
        try:
            line = ctrl_file.readline(65536)
            hello = json.loads(line.decode() or "{}")
        except (OSError, json.JSONDecodeError):
            ctrl.close()
            return
        entity = hello.get("entity")
        # chisel auth is "notused:<api-token>" (tunnel_command.go:74);
        # here the token field directly.
        if self.api_token is not None and hello.get("token") != self.api_token:
            ctrl.sendall(json.dumps(
                {"ok": False, "error": "unauthorized"}).encode() + b"\n")
            ctrl.close()
            return
        if not entity:
            ctrl.sendall(json.dumps(
                {"ok": False, "error": "entity required"}).encode() + b"\n")
            ctrl.close()
            return
        try:
            bastion = socket.create_server(
                ("127.0.0.1", int(self.port_for(entity) or 0)))
        except OSError as e:
            ctrl.sendall(json.dumps(
                {"ok": False, "error": f"bastion bind failed: {e}"}
            ).encode() + b"\n")
            ctrl.close()
            return
        bport = bastion.getsockname()[1]
        ctrl.sendall(json.dumps(
            {"ok": True, "bastion_port": bport}).encode() + b"\n")
        self._bastions[entity] = bastion

        lock = threading.Lock()
        streams: dict[int, socket.socket] = {}
        next_id = [1]
        alive = threading.Event()
        alive.set()

        def bastion_accept() -> None:
            while alive.is_set():
                try:
                    inbound, _ = bastion.accept()
                except OSError:
                    return
                sid = next_id[0]
                next_id[0] += 1
                streams[sid] = inbound
                try:
                    _send_frame(ctrl, lock, OPEN, sid)
                except OSError:
                    inbound.close()
                    return
                threading.Thread(
                    target=_pipe_to_frames,
                    args=(inbound, ctrl, lock, sid), daemon=True).start()

        threading.Thread(target=bastion_accept, daemon=True).start()
        try:
            while alive.is_set():
                frame = _recv_frame(ctrl)
                if frame is None:
                    break
                ftype, sid, payload = frame
                if ftype == PING:
                    _send_frame(ctrl, lock, PONG, 0)
                elif ftype == DATA and sid in streams:
                    try:
                        streams[sid].sendall(payload)
                    except OSError:
                        _send_frame(ctrl, lock, CLOSE, sid)
                elif ftype == CLOSE and sid in streams:
                    try:
                        streams.pop(sid).close()
                    except OSError:
                        pass
        except (OSError, ValueError):
            pass
        finally:
            alive.clear()
            self._bastions.pop(entity, None)
            for s in streams.values():
                try:
                    s.close()
                except OSError:
                    pass
            try:
                bastion.close()
            except OSError:
                pass
            try:
                ctrl.close()
            except OSError:
                pass


class TunnelClient:
    """User-machine side (the CLI's embedded chisel client,
    tunnel_command.go:70-117): maintains the control connection and
    dials ``localhost:<local_port>`` for each OPEN."""

    def __init__(self, server_host: str, server_port: int, entity: str,
                 local_port: int, api_token: str = "",
                 keepalive: float = 25.0):
        self.server_host = server_host
        self.server_port = server_port
        self.entity = entity
        self.local_port = local_port
        self.api_token = api_token
        self.keepalive = keepalive
        self.bastion_port: int | None = None
        self._ctrl: socket.socket | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    def start(self) -> "TunnelClient":
        ctrl = socket.create_connection(
            (self.server_host, self.server_port), timeout=10)
        ctrl.sendall(json.dumps({
            "token": self.api_token, "entity": self.entity,
        }).encode() + b"\n")
        resp = json.loads(ctrl.makefile("rb").readline(65536).decode())
        if not resp.get("ok"):
            ctrl.close()
            raise ConnectionError(
                f"tunnel handshake failed: {resp.get('error')}")
        self.bastion_port = resp["bastion_port"]
        ctrl.settimeout(None)
        self._ctrl = ctrl
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        threading.Thread(target=self._keepalive_loop, daemon=True).start()
        return self

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()

    def stop(self) -> None:
        self._stop.set()
        if self._ctrl is not None:
            try:
                self._ctrl.close()
            except OSError:
                pass

    def _keepalive_loop(self) -> None:
        lock = self._lock
        while not self._stop.wait(self.keepalive):
            try:
                _send_frame(self._ctrl, lock, PING, 0)
            except OSError:
                return

    def _run(self) -> None:
        ctrl = self._ctrl
        lock = self._lock
        streams: dict[int, socket.socket] = {}
        try:
            while not self._stop.is_set():
                frame = _recv_frame(ctrl)
                if frame is None:
                    break
                ftype, sid, payload = frame
                if ftype == OPEN:
                    try:
                        local = socket.create_connection(
                            ("127.0.0.1", self.local_port), timeout=10)
                    except OSError:
                        _send_frame(ctrl, lock, CLOSE, sid)
                        continue
                    streams[sid] = local
                    threading.Thread(
                        target=_pipe_to_frames,
                        args=(local, ctrl, lock, sid), daemon=True).start()
                elif ftype == DATA and sid in streams:
                    try:
                        streams[sid].sendall(payload)
                    except OSError:
                        _send_frame(ctrl, lock, CLOSE, sid)
                elif ftype == CLOSE and sid in streams:
                    try:
                        streams.pop(sid).close()
                    except OSError:
                        pass
        except (OSError, ValueError):
            pass
        finally:
            for s in streams.values():
                try:
                    s.close()
                except OSError:
                    pass
