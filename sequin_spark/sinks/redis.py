"""Redis sinks: redis_string (cache upsert) and redis_stream (XADD).

Reference semantics:
- redis_string: SET key payload [PX expire_ms] on insert/update/read,
  DEL key on delete (redis_string_pipeline.ex, routing/consumers/
  redis_string.ex:26-43) — an always-fresh cache of the source rows;
- redis_stream: XADD stream_key * data payload (redis_stream_pipeline.ex).

Command construction is pure (tested without a server); transport uses
redis-py when installed, else the sink fails loudly at open(). Commands
are emitted pipelined — one round trip per SinkBatch, the same batching
the reference's pipeline shell does.
"""

from __future__ import annotations

from sequin_spark.sinks.base import Sink, SinkBatch


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


class _RedisBase(Sink):
    def open(self) -> None:
        try:
            import redis
        except ImportError as e:
            raise NotImplementedError(
                f"sink {self.sink_type!r} requires redis-py, not installed here "
                "(command construction is tested; see build_*_commands)"
            ) from e
        self._client = redis.Redis.from_url(self.config.get("url", "redis://localhost:6379/0"))

    def _execute(self, cmds: list[tuple]) -> None:
        pipe = self._client.pipeline(transaction=False)
        for cmd in cmds:
            pipe.execute_command(*cmd)
        pipe.execute()


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
