"""Redis sinks: redis_string (cache upsert) and redis_stream (XADD).

Reference semantics:
- redis_string: SET key payload [PX expire_ms] on insert/update/read,
  DEL key on delete (redis_string_pipeline.ex, routing/consumers/
  redis_string.ex:26-43) — an always-fresh cache of the source rows;
- redis_stream: XADD stream_key * data payload (redis_stream_pipeline.ex).

Command construction is pure (tested without a server); the transport
is a minimal RESP2 client over a raw socket (the public Redis protocol:
arrays of bulk strings out; +simple/-error/:int/$bulk/*array replies
in), with optional AUTH (``password`` / ``username``+``password``,
Redis 6 ACL form) and SELECT from the url db path. Commands are emitted
pipelined — all writes flushed, then all replies read: one round trip
per SinkBatch, the same batching the reference's pipeline shell does
(redis_stream_pipeline.ex pipelines via eredis). An -ERR reply raises,
nacking the batch.
"""

from __future__ import annotations

import socket

from sequin_spark.sinks.base import Sink, SinkBatch


def encode_command(cmd: tuple) -> bytes:
    """RESP2 request: *<n>\\r\\n then $<len>\\r\\n<arg>\\r\\n per arg."""
    out = [b"*%d\r\n" % len(cmd)]
    for a in cmd:
        b = a if isinstance(a, bytes) else str(a).encode()
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


class RespError(RuntimeError):
    pass


class RespConnectionClosed(RespError):
    """EOF mid-reply — a DEAD connection, distinct from a server -ERR
    reply (which leaves the connection alive and in sync).  A separate
    class, not a message substring: a genuine Redis error whose text
    happens to contain 'connection closed' must not be misclassified
    as EOF (that would abort the drain and desynchronize the retry)."""


def read_reply(buf):
    """Parse one RESP2 reply from a readable; raises RespError on -,
    RespConnectionClosed on EOF."""
    line = buf.readline()
    if not line:
        raise RespConnectionClosed("redis: connection closed")
    t, rest = line[:1], line[1:-2]
    if t == b"+":
        return rest.decode()
    if t == b"-":
        raise RespError(rest.decode())
    if t == b":":
        return int(rest)
    if t == b"$":
        n = int(rest)
        if n == -1:
            return None
        data = buf.read(n + 2)
        # EOF mid-bulk must be a dead connection, not a truncated
        # "successful" reply — otherwise a batch whose last reply (e.g.
        # an XADD id) is cut off reports delivered on a dead socket.
        if len(data) != n + 2:
            raise RespConnectionClosed("redis: connection closed mid-bulk")
        return data[:n]
    if t == b"*":
        n = int(rest)
        if n == -1:
            return None
        return [read_reply(buf) for _ in range(n)]
    raise RespError(f"redis: unknown reply type {t!r}")


def build_string_commands(rows: list[dict]) -> list[tuple]:
    """[(('SET', key, value[, 'PX', ms]) | ('DEL', key)), ...]"""
    cmds: list[tuple] = []
    for row in rows:
        key = row.get("key") or ""
        if row.get("redis_action") == "del":
            cmds.append(("DEL", key))
        else:
            cmd: tuple = ("SET", key, row.get("value", ""))
            if row.get("expire_ms"):
                cmd = cmd + ("PX", int(row["expire_ms"]))
            cmds.append(cmd)
    return cmds


def build_stream_commands(rows: list[dict]) -> list[tuple]:
    return [
        ("XADD", row.get("stream_key") or row.get("key") or "sequin", "*", "data", row.get("value", ""))
        for row in rows
    ]


def parse_redis_url(url: str) -> dict:
    """redis://[user:pass@]host[:port][/db] (+ rediss:// for TLS)."""
    from urllib.parse import unquote, urlsplit

    u = urlsplit(url)
    if u.scheme not in ("redis", "rediss"):
        raise ValueError(f"unsupported redis url scheme {u.scheme!r}")
    db = (u.path or "/").lstrip("/")
    return {
        "host": u.hostname or "127.0.0.1",
        "port": u.port or 6379,
        "username": unquote(u.username) if u.username else None,
        "password": unquote(u.password) if u.password else None,
        "db": int(db) if db else 0,
        "tls": u.scheme == "rediss",
    }


class _RedisBase(Sink):
    def open(self) -> None:
        cfg = parse_redis_url(self.config.get("url", "redis://localhost:6379/0"))
        sock = socket.create_connection((cfg["host"], cfg["port"]), timeout=10)
        if cfg["tls"]:
            import ssl

            ctx = self.config.get("ssl_context") or ssl.create_default_context()
            sock = ctx.wrap_socket(sock, server_hostname=cfg["host"])
        self._sock = sock
        self._buf = sock.makefile("rb")
        if cfg["password"] is not None:
            auth = (("AUTH", cfg["username"], cfg["password"])
                    if cfg["username"] else ("AUTH", cfg["password"]))
            self._execute([auth])
        if cfg["db"]:
            self._execute([("SELECT", cfg["db"])])

    def _execute(self, cmds: list[tuple]) -> list:
        """Pipelined round trip that NEVER leaves the connection
        desynchronized: on a -ERR reply mid-batch the remaining replies
        are still drained before the first error is raised — otherwise
        a retry on the same socket would match leftover '+OK's of this
        batch to the next batch's commands and report failed writes as
        delivered.  A dead connection (EOF) aborts the drain; the
        socket is useless either way and close() is safe."""
        self._sock.sendall(b"".join(encode_command(c) for c in cmds))
        replies: list = []
        first_err: RespError | None = None
        for _ in cmds:
            try:
                replies.append(read_reply(self._buf))
            except RespConnectionClosed as e:
                raise first_err or e from None
            except RespError as e:
                if first_err is None:
                    first_err = e
                replies.append(e)
        if first_err is not None:
            raise first_err
        return replies

    def close(self) -> None:
        sock = getattr(self, "_sock", None)  # open() may have failed first
        if sock is None:
            return
        try:
            sock.close()
        except OSError:
            pass


class RedisStringSink(_RedisBase):
    sink_type = "redis_string"
    default_batch_size = 10

    def deliver(self, batch: SinkBatch) -> None:
        self._execute(build_string_commands(batch.rows))


class RedisStreamSink(_RedisBase):
    sink_type = "redis_stream"
    default_batch_size = 50

    def deliver(self, batch: SinkBatch) -> None:
        self._execute(build_stream_commands(batch.rows))
