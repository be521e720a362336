"""Kafka sink — minimal wire-protocol producer over a raw socket.

Reference: lib/sequin/runtime/kafka_pipeline.ex (batch key = {topic,
partition}, partition chosen by hashing the message key — group_id —
into the topic's partition count, kafka_pipeline.ex:38-51,103-108;
message_key/1 = group_id, sinks/kafka/kafka.ex:45-49) and
lib/sequin/sinks/kafka/client.ex (produce_sync with bounded retries,
client.ex:14-52; test_connection via metadata, client.ex:60-77).

This implements the public Apache Kafka protocol (KIP-documented,
https://kafka.apache.org/protocol): ApiVersions v0 handshake, Metadata
v1 for partition discovery, and Produce v3 carrying message-format-v2
RecordBatches (CRC32C-checksummed) with acks=-1, so delivery is
broker-acknowledged before the engine acks upstream — the same
at-least-once contract as every other sink. The reference's Erlang
`:erlang.phash2(key, n)` partitioner is not portable; we use Kafka's
own default murmur2 partitioner (what the Java client does), which
preserves the invariant that matters: one group → one partition →
per-group order.

Auth: TLS from byte 0 (`tls`, optional `ssl_context`/`tls_insecure`)
and SASL PLAIN / SCRAM-SHA-256 / SCRAM-SHA-512 / AWS_MSK_IAM via
SaslHandshake v1 + SaslAuthenticate v0 (KIP-43/KIP-152) — the
reference's full mechanism list (kafka_sink.ex:16-28); MSK IAM is the
SigV4-signed JSON payload of msk_iam.py and, like the reference,
requires TLS (kafka_sink.ex:110-121).

Only the produce path is implemented (the engine never consumes);
tests run against a fake broker speaking the same frames
(tests/test_kafka.py), like the NATS/AMQP sinks.
"""

from __future__ import annotations

import socket
import struct

from sequin_spark.sinks.base import Sink, SinkBatch, register_sink

API_PRODUCE, API_METADATA, API_VERSIONS = 0, 3, 18
API_SASL_HANDSHAKE, API_SASL_AUTHENTICATE = 17, 36

# config `sasl_mechanism` → (wire mechanism, scram hash | None);
# the reference's list (lib/sequin/consumers/kafka_sink.ex:16-28,99).
# aws-msk-iam is dispatched separately (_sasl_msk_iam) — it is a
# single-round signed-payload mechanism, not a username/password one.
SASL_MECHANISMS = {
    "plain": ("PLAIN", None),
    "scram-sha-256": ("SCRAM-SHA-256", "sha256"),
    "scram-sha-512": ("SCRAM-SHA-512", "sha512"),
}


# --- CRC32C (Castagnoli, reflected 0x1EDC6F41) — required by the v2
# RecordBatch format; stdlib zlib.crc32 is the wrong polynomial --------
def _crc32c_table() -> list[int]:
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ poly if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC32C_TABLE = _crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = _CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# --- murmur2 (Kafka DefaultPartitioner, org.apache.kafka.common.utils
# .Utils.murmur2) ------------------------------------------------------
def murmur2(data: bytes) -> int:
    length = len(data)
    seed = 0x9747B28C
    m, r = 0x5BD1E995, 24
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    while length - i >= 4:
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    rem = length - i
    if rem >= 3:
        h ^= (data[i + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[i + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[i] & 0xFF
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for_key(key: str | None, n_partitions: int) -> int:
    """Kafka default partitioner: toPositive(murmur2(key)) % n
    (kafka_pipeline.ex:103-108 semantics — keyed → deterministic
    partition; the reference randomizes empty keys, we pin to 0 for
    deterministic tests)."""
    if not key:
        return 0
    return (murmur2(key.encode()) & 0x7FFFFFFF) % n_partitions


# --- primitive encoders ----------------------------------------------
def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def _varint(n: int) -> bytes:
    """Zigzag varint (protobuf-style) used inside v2 records."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        if z & ~0x7F:
            out.append((z & 0x7F) | 0x80)
            z >>= 7
        else:
            out.append(z)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, z = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def encode_record(offset_delta: int, key: bytes | None, value: bytes) -> bytes:
    body = bytearray()
    body += b"\x00"  # attributes
    body += _varint(0)  # timestampDelta
    body += _varint(offset_delta)
    if key is None:
        body += _varint(-1)
    else:
        body += _varint(len(key)) + key
    body += _varint(len(value)) + value
    body += _varint(0)  # headers
    return _varint(len(body)) + bytes(body)


# RecordBatch attributes bits 0-2 (public protocol "compression" enum,
# the reference sink's codec list kafka_sink.ex:28)
COMPRESSION_CODECS = {"none": 0, "gzip": 1, "snappy": 2, "lz4": 3, "zstd": 4}


def _compress(codec: str, data: bytes) -> bytes:
    if codec == "gzip":  # Kafka's GZIP codec = RFC 1952 (gzip.compress)
        import gzip

        # mtime=0: deterministic bytes (gzip embeds a timestamp header)
        return gzip.compress(data, mtime=0)
    if codec == "snappy":
        # vendored pure-Python codec with XERIAL stream framing — the
        # framing the Kafka JVM client's SnappyOutputStream wraps
        # snappy batches in (raw snappy blocks alone would be rejected
        # by JVM consumers); see sinks/snappy_py.py
        from sequin_spark.sinks import snappy_py

        return snappy_py.compress(data)
    if codec == "lz4":
        # vendored pure-Python LZ4 FRAME codec (magic + descriptor +
        # XXH32 checksums) — the format the Kafka JVM client reads for
        # message-format v2 batches; see sinks/lz4_py.py
        from sequin_spark.sinks import lz4_py

        return lz4_py.compress(data)
    if codec == "zstd":
        # decode side is vendored pure-Python (sinks/zstd_py.py, RFC
        # 8878); encode uses libzstd via ctypes, falling back to
        # store-mode (raw-block) frames so the codec never gates
        # (worst case the batch ships framed-but-uncompressed)
        from sequin_spark.sinks import zstd_py

        return zstd_py.compress(data)
    raise ValueError(f"unknown kafka compression codec {codec!r}; "
                     f"supported: {sorted(COMPRESSION_CODECS)}")


def _decompress(codec_bits: int, data: bytes) -> bytes:
    if codec_bits == 0:
        return data
    if codec_bits == 1:
        import gzip

        return gzip.decompress(data)
    if codec_bits == 2:
        from sequin_spark.sinks import snappy_py

        # accepts xerial-framed (JVM producers) and bare-block snappy
        return snappy_py.decompress(data)
    if codec_bits == 3:
        from sequin_spark.sinks import lz4_py

        return lz4_py.decompress(data)
    if codec_bits == 4:
        # vendored pure-Python RFC 8878 decoder — JVM-producer zstd
        # batches decode with no native library present
        from sequin_spark.sinks import zstd_py

        return zstd_py.decompress(data)
    raise ValueError(f"unknown codec bits {codec_bits}")


def encode_record_batch(records: list[tuple[bytes | None, bytes]],
                        base_ts_ms: int = 0,
                        compression: str = "none") -> bytes:
    """Message-format v2 RecordBatch (magic=2) with CRC32C; when a
    codec is set, the records block is compressed as a unit and the
    codec goes in attributes bits 0-2 (public protocol; reference
    kafka_sink.ex:28 `compression` field)."""
    recs = b"".join(
        encode_record(i, k, v) for i, (k, v) in enumerate(records)
    )
    codec = COMPRESSION_CODECS.get(compression)
    if codec is None:
        raise ValueError(f"unknown kafka compression codec {compression!r}; "
                         f"supported: {sorted(COMPRESSION_CODECS)}")
    if codec:
        recs = _compress(compression, recs)
    # everything from attributes onward is CRC'd
    after_crc = (
        struct.pack(">hiqqqhii", codec, len(records) - 1, base_ts_ms,
                    base_ts_ms, -1, -1, -1, len(records))
        + recs
    )
    head = struct.pack(">ib", -1, 2)  # partitionLeaderEpoch, magic
    crc = struct.pack(">I", crc32c(after_crc))
    batch_body = head + crc + after_crc
    return struct.pack(">qi", 0, len(batch_body)) + batch_body


def parse_record_batch(data: bytes) -> list[tuple[bytes | None, bytes]]:
    """Decode a v2 RecordBatch (fake broker + tests); verifies the CRC."""
    base_offset, batch_len = struct.unpack_from(">qi", data, 0)
    _leader_epoch, magic = struct.unpack_from(">ib", data, 12)
    if magic != 2:
        raise ValueError(f"unsupported magic {magic}")
    (crc,) = struct.unpack_from(">I", data, 17)
    after = data[21:12 + batch_len]
    if crc32c(after) != crc:
        raise ValueError("record batch CRC mismatch")
    (attrs, _last_delta, _bts, _mts, _pid, _pepoch, _bseq, n) = struct.unpack_from(
        ">hiqqqhii", after, 0
    )
    head_len = struct.calcsize(">hiqqqhii")
    if attrs & 0x07:  # compressed records block (CRC covers the wire bytes)
        after = after[:head_len] + _decompress(attrs & 0x07, after[head_len:])
    pos = head_len
    out = []
    for _ in range(n):
        _rec_len, pos = read_varint(after, pos)
        pos += 1  # attributes
        _tsd, pos = read_varint(after, pos)
        _od, pos = read_varint(after, pos)
        klen, pos = read_varint(after, pos)
        key = None
        if klen >= 0:
            key = after[pos:pos + klen]
            pos += klen
        vlen, pos = read_varint(after, pos)
        value = after[pos:pos + vlen]
        pos += vlen
        nh, pos = read_varint(after, pos)
        for _ in range(nh):  # pragma: no cover - we never send headers
            hk, pos = read_varint(after, pos)
            pos += hk
            hv, pos = read_varint(after, pos)
            pos += hv
        out.append((key, value))
    return out


class KafkaSink(Sink):
    """Produce-only Kafka client: Metadata for partition counts, then
    Produce v3 per (topic, partition) batch with acks=all."""

    sink_type = "kafka"
    default_batch_size = 200  # max_demand/batch defaults, kafka_pipeline parity

    def open(self) -> None:
        mech = str(self.config.get("sasl_mechanism", "")).lower().replace("_", "-")
        if mech == "aws-msk-iam":
            # validate before dialing: the reference requires TLS with
            # :aws_msk_iam (kafka_sink.ex:110-121) and the three AWS
            # fields; failing fast beats a confusing TLS handshake error
            if not self.config.get("tls"):
                raise ValueError(
                    "aws-msk-iam requires tls=true (the signed payload is "
                    "a bearer credential; kafka_sink.ex requires TLS too)")
            for k in ("aws_access_key_id", "aws_secret_access_key",
                      "aws_region"):
                if not self.config.get(k):
                    raise ValueError(f"aws-msk-iam requires config {k!r}")
        comp = self.config.get("compression", "none")
        if comp not in COMPRESSION_CODECS:
            raise ValueError(f"unknown kafka compression codec {comp!r}; "
                             f"supported: {sorted(COMPRESSION_CODECS)}")
        if comp != "none":
            _compress(comp, b"")  # fail fast if the codec lib is absent
        hosts = self.config.get("hosts", "127.0.0.1:9092")
        host, _, port = hosts.split(",")[0].partition(":")
        self._host = host
        self._client_id = self.config.get("client_id", "sequin_spark")
        self._corr = 0
        self._partition_counts: dict[str, int] = {}
        self._open_socket(host, int(port or 9092))
        # ApiVersions handshake (ignore the advertised ranges — we only
        # speak pinned versions, like the reference pins its brod vsn)
        try:
            self._request(API_VERSIONS, 0, b"")
        except Exception:  # noqa: BLE001 - some brokers close on v0; reconnect
            self._open_socket(host, int(port or 9092))
        if self.config.get("sasl_mechanism"):
            self._sasl_auth()

    def _open_socket(self, host: str, port: int) -> None:
        """TCP connect, TLS-wrapped from byte 0 when `tls` is set (Kafka
        has no STARTTLS — an encrypted listener speaks TLS immediately).
        `ssl_context` overrides (tests / custom CAs); `tls_insecure`
        skips verification (rung below verify, like ssl_mode=require)."""
        sock = socket.create_connection((host, port), timeout=10)
        if self.config.get("tls"):
            from sequin_spark.tlsutil import make_client_context

            ctx = make_client_context(
                not self.config.get("tls_insecure"),
                self.config.get("ssl_context"))
            sock = ctx.wrap_socket(sock, server_hostname=host)
        self._sock = sock
        self._buf = self._sock.makefile("rb")

    def _sasl_auth(self) -> None:
        """SaslHandshake v1 + SaslAuthenticate v0 per the public
        protocol (KIP-43/KIP-152). PLAIN is one authenticate round;
        SCRAM is client-first/server-first/client-final/server-final
        with the server signature verified (scram.py)."""
        mech_cfg = str(self.config.get("sasl_mechanism", "")).lower().replace("_", "-")
        if mech_cfg == "aws-msk-iam":
            return self._sasl_msk_iam()
        if mech_cfg not in SASL_MECHANISMS:
            raise ValueError(
                f"unknown sasl_mechanism {mech_cfg!r}; "
                f"supported: {sorted(SASL_MECHANISMS)}")
        wire, algo = SASL_MECHANISMS[mech_cfg]
        user = self.config.get("username", "")
        password = self.config.get("password", "")
        self._sasl_handshake(wire)
        if algo is None:  # PLAIN: authzid NUL user NUL password
            self._sasl_round(
                b"\x00" + user.encode() + b"\x00" + password.encode())
        else:
            from sequin_spark.sources.scram import ScramClient

            # Kafka SCRAM authenticates the n= attribute itself (unlike
            # Postgres, which takes the user from the startup packet)
            sc = ScramClient(username=user, password=password, algo=algo)
            server_first = self._sasl_round(sc.first().encode()).decode()
            server_final = self._sasl_round(
                sc.final(server_first).encode()).decode()
            sc.verify_server(server_final)

    def _sasl_msk_iam(self) -> None:
        """AWS_MSK_IAM: handshake then ONE authenticate round carrying
        the SigV4-signed JSON payload (msk_iam.py).  The reference
        requires TLS with this mechanism (kafka_sink.ex:110-121) —
        the payload is a bearer credential, so we enforce it too."""
        from sequin_spark.sinks.msk_iam import build_payload

        self._sasl_handshake("AWS_MSK_IAM")
        payload = build_payload(
            self._host,
            self.config["aws_access_key_id"],
            self.config["aws_secret_access_key"],
            self.config["aws_region"],
            session_token=self.config.get("aws_session_token"),
            user_agent=f"sequin-spark/{self._client_id}",
            now=self.config.get("_msk_iam_now"),  # test clock override
        )
        self._sasl_round(payload)

    def _sasl_handshake(self, wire: str) -> None:
        """SaslHandshake v1; on rejection the error lists the broker's
        offered mechanisms (same diagnostic for every mechanism)."""
        resp = self._request(API_SASL_HANDSHAKE, 1, _str(wire))
        (err,) = struct.unpack_from(">h", resp, 0)
        if err:
            (n,) = struct.unpack_from(">i", resp, 2)
            pos, offered = 6, []
            for _ in range(n):
                (ln,) = struct.unpack_from(">h", resp, pos)
                offered.append(resp[pos + 2:pos + 2 + ln].decode())
                pos += 2 + ln
            raise RuntimeError(
                f"kafka: broker rejected SASL mechanism {wire} "
                f"(error {err}; broker offers {offered})")

    def _sasl_round(self, auth_bytes: bytes) -> bytes:
        resp = self._request(API_SASL_AUTHENTICATE, 0, _bytes(auth_bytes))
        (err,) = struct.unpack_from(">h", resp, 0)
        pos = 2
        (mlen,) = struct.unpack_from(">h", resp, pos)
        pos += 2
        message = None
        if mlen >= 0:
            message = resp[pos:pos + mlen].decode()
            pos += mlen
        (blen,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        data = resp[pos:pos + blen] if blen >= 0 else b""
        if err:
            raise RuntimeError(
                f"kafka: SASL authentication failed (error {err}): {message}")
        return data

    def _request(self, api_key: int, api_version: int, body: bytes) -> bytes:
        self._corr += 1
        header = struct.pack(">hhi", api_key, api_version, self._corr) + _str(self._client_id)
        msg = header + body
        self._sock.sendall(struct.pack(">i", len(msg)) + msg)
        (size,) = struct.unpack(">i", self._buf.read(4))
        resp = self._buf.read(size)
        (corr,) = struct.unpack_from(">i", resp, 0)
        if corr != self._corr:
            raise RuntimeError(f"kafka: correlation mismatch {corr} != {self._corr}")
        return resp[4:]

    def partition_count(self, topic: str) -> int:
        """get_partition_count parity (sinks/kafka/kafka.ex:40-43),
        cached per connection like the reference's ConnectionCache."""
        if topic not in self._partition_counts:
            self._metadata(topic)
        return self._partition_counts[topic]

    def _metadata(self, topic: str) -> None:
        body = struct.pack(">i", 1) + _str(topic)
        resp = self._request(API_METADATA, 1, body)
        pos = 0
        (n_brokers,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_brokers):
            pos += 4  # node_id
            (hlen,) = struct.unpack_from(">h", resp, pos)
            pos += 2 + hlen + 4  # host, port
            (rlen,) = struct.unpack_from(">h", resp, pos)
            pos += 2 + max(0, rlen)  # rack (nullable)
        pos += 4  # controller_id
        (n_topics,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_topics):
            (err,) = struct.unpack_from(">h", resp, pos)
            pos += 2
            (tlen,) = struct.unpack_from(">h", resp, pos)
            name = resp[pos + 2:pos + 2 + tlen].decode()
            pos += 2 + tlen + 1  # name, is_internal
            (n_parts,) = struct.unpack_from(">i", resp, pos)
            pos += 4
            for _ in range(n_parts):
                pos += 2 + 4 + 4  # error, partition id, leader
                (n_rep,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n_rep
                (n_isr,) = struct.unpack_from(">i", resp, pos)
                pos += 4 + 4 * n_isr
            if err:
                raise RuntimeError(f"kafka: metadata error {err} for {name}")
            self._partition_counts[name] = n_parts

    def _produce(self, topic: str, partition: int, records: list[tuple[bytes | None, bytes]]) -> None:
        batch = encode_record_batch(
            records, compression=self.config.get("compression", "none"))
        body = (
            _str(None)  # transactional_id
            + struct.pack(">hi", -1, int(self.config.get("timeout_ms", 30000)))  # acks=all
            + struct.pack(">i", 1) + _str(topic)
            + struct.pack(">i", 1) + struct.pack(">i", partition)
            + _bytes(batch)
        )
        resp = self._request(API_PRODUCE, 3, body)
        pos = 4  # topic array count
        (tlen,) = struct.unpack_from(">h", resp, pos)
        pos += 2 + tlen
        (n_parts,) = struct.unpack_from(">i", resp, pos)
        pos += 4
        for _ in range(n_parts):
            _pid, err = struct.unpack_from(">ih", resp, pos)
            if err:
                raise RuntimeError(f"kafka: produce error code {err}")
            pos += 4 + 2 + 8 + 8  # partition, error, base_offset, log_append_time

    def deliver(self, batch: SinkBatch) -> None:
        """One Produce per (topic, partition) — rows arrive in group
        order and same group → same key → same partition, so broker
        append order preserves per-group order (kafka_pipeline.ex:46-51)."""
        topic = batch.routing.get("topic") or self.config.get("topic", "sequin.events")
        n = self.partition_count(topic)
        by_partition: dict[int, list[tuple[bytes | None, bytes]]] = {}
        for row in batch.rows:
            key = row.get("key") or row.get("group_id") or ""
            part = partition_for_key(key, n)
            by_partition.setdefault(part, []).append(
                (key.encode() if key else None, (row.get("value") or "").encode())
            )
        for part, records in by_partition.items():
            self._produce(topic, part, records)

    def close(self) -> None:
        try:
            self._sock.close()
        except Exception:  # noqa: BLE001
            pass


register_sink("kafka", KafkaSink)
