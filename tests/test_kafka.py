"""Kafka sink against a fake broker speaking the Kafka wire protocol
(ApiVersions / Metadata v1 / Produce v3 with v2 RecordBatches)."""

import json
import socket
import struct
import threading

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink
from sequin_spark.sinks.kafka import (
    API_METADATA,
    API_PRODUCE,
    API_SASL_AUTHENTICATE,
    API_SASL_HANDSHAKE,
    API_VERSIONS,
    crc32c,
    murmur2,
    parse_record_batch,
    partition_for_key,
)


def _str(s):
    b = s.encode()
    return struct.pack(">h", len(b)) + b


class FakeKafka:
    """Single-node fake broker: answers ApiVersions/Metadata, records
    Produce payloads after verifying the RecordBatch CRC."""

    def __init__(self, n_partitions=3, fail_codes=None, sasl=None,
                 sasl_user="kuser", sasl_password="kpass", ssl_ctx=None,
                 iam_secrets=None):
        self.n_partitions = n_partitions
        self.produced = []  # (topic, partition, key, value)
        self.fail_codes = list(fail_codes or [])
        # "plain" | "scram-sha-256" | "scram-sha-512" | "aws-msk-iam"
        self.sasl = sasl
        self.sasl_user, self.sasl_password = sasl_user, sasl_password
        # access-key-id -> secret, for aws-msk-iam signature verification
        self.iam_secrets = dict(iam_secrets or {})
        self.ssl_ctx = ssl_ctx  # server SSLContext -> TLS from byte 0
        self.authenticated = False
        self.handshook_mechanism = None
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        s.listen(4)
        self.port = s.getsockname()[1]
        self._srv = s
        threading.Thread(target=self._accept_loop, daemon=True).start()

    def _accept_loop(self):
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn):
        if self.ssl_ctx is not None:
            try:
                conn = self.ssl_ctx.wrap_socket(conn, server_side=True)
            except OSError:
                return  # client gave up during the TLS handshake
        buf = conn.makefile("rb")
        scram_srv = None
        while True:
            head = buf.read(4)
            if len(head) < 4:
                return
            (size,) = struct.unpack(">i", head)
            req = buf.read(size)
            api_key, api_version, corr = struct.unpack_from(">hhi", req, 0)
            (cid_len,) = struct.unpack_from(">h", req, 8)
            body = req[10 + cid_len:]
            if api_key == API_SASL_HANDSHAKE:
                (mlen,) = struct.unpack_from(">h", body, 0)
                mech = body[2:2 + mlen].decode()
                self.handshook_mechanism = mech
                want = {"aws-msk-iam": "AWS_MSK_IAM"}.get(
                    self.sasl, (self.sasl or "").upper())
                if mech == want:
                    resp = struct.pack(">hi", 0, 1) + _str(want)
                else:  # 33 = UNSUPPORTED_SASL_MECHANISM
                    resp = struct.pack(">hi", 33, 1) + _str(want)
            elif api_key == API_SASL_AUTHENTICATE:
                (alen,) = struct.unpack_from(">i", body, 0)
                auth = body[4:4 + alen]
                ok, out = self._sasl_step(auth, lambda: scram_srv)
                if ok is None:  # SCRAM continue: out = (srv, bytes)
                    scram_srv, data = out
                    resp = struct.pack(">hh", 0, -1) + struct.pack(">i", len(data)) + data
                elif ok:
                    self.authenticated = True
                    resp = struct.pack(">hh", 0, -1) + struct.pack(">i", len(out)) + out
                else:
                    em = b"Authentication failed"
                    resp = (struct.pack(">h", 58)  # SASL_AUTHENTICATION_FAILED
                            + struct.pack(">h", len(em)) + em
                            + struct.pack(">i", -1))
            elif api_key == API_VERSIONS:
                resp = struct.pack(">hi", 0, 3) + b"".join(
                    struct.pack(">hhh", k, 0, 9) for k in (0, 3, 18)
                )
            elif api_key == API_METADATA:
                (n_topics,) = struct.unpack_from(">i", body, 0)
                (tlen,) = struct.unpack_from(">h", body, 4)
                topic = body[6:6 + tlen].decode()
                parts = b"".join(
                    struct.pack(">hiii", 0, p, 1, 1) + struct.pack(">i", 1)
                    + struct.pack(">ii", 1, 1)  # replicas=[1], isr count=1
                    for p in range(self.n_partitions)
                )
                # broker array: [node 1 @ host:port, rack=null]
                brokers = struct.pack(">i", 1) + struct.pack(">i", 1) + _str("127.0.0.1") \
                    + struct.pack(">i", self.port) + struct.pack(">h", -1)
                resp = (
                    brokers + struct.pack(">i", 1)  # controller_id
                    + struct.pack(">i", 1)          # topic array
                    + struct.pack(">h", 0) + _str(topic) + b"\x00"
                    + struct.pack(">i", self.n_partitions) + parts
                )
            elif api_key == API_PRODUCE:
                assert api_version == 3
                pos = 0
                (tid_len,) = struct.unpack_from(">h", body, pos)
                pos += 2 + max(0, tid_len)
                acks, _timeout = struct.unpack_from(">hi", body, pos)
                assert acks == -1  # acks=all — broker-confirmed delivery
                pos += 6
                pos += 4  # topic array count (always 1)
                (tlen,) = struct.unpack_from(">h", body, pos)
                topic = body[pos + 2:pos + 2 + tlen].decode()
                pos += 2 + tlen
                pos += 4  # partition array count (always 1)
                (partition,) = struct.unpack_from(">i", body, pos)
                pos += 4
                (blen,) = struct.unpack_from(">i", body, pos)
                pos += 4
                batch = body[pos:pos + blen]
                err = self.fail_codes.pop(0) if self.fail_codes else 0
                if not err:
                    for key, value in parse_record_batch(batch):  # verifies CRC
                        self.produced.append(
                            (topic, partition,
                             key.decode() if key is not None else None, value.decode())
                        )
                resp = (
                    struct.pack(">i", 1) + _str(topic)
                    + struct.pack(">i", 1)
                    + struct.pack(">ihqq", partition, err, len(self.produced), -1)
                    + struct.pack(">i", 0)  # throttle_time
                )
            else:  # pragma: no cover
                resp = b""
            payload = struct.pack(">i", corr) + resp
            conn.sendall(struct.pack(">i", len(payload)) + payload)

    def _sasl_step(self, auth, get_scram):
        """Returns (True, final_bytes) | (None, (srv, continue_bytes)) |
        (False, None)."""
        if self.sasl == "plain":
            parts = auth.split(b"\x00")
            ok = (len(parts) == 3 and parts[1].decode() == self.sasl_user
                  and parts[2].decode() == self.sasl_password)
            return (True, b"") if ok else (False, None)
        if self.sasl == "aws-msk-iam":
            from sequin_spark.sinks.msk_iam import MskIamError, verify_payload

            try:
                verify_payload(auth, "127.0.0.1", self.iam_secrets)
            except MskIamError:
                return False, None
            return True, (b'{"version":"2020_10_22",'
                          b'"request-id":"fake-0001"}')
        from sequin_spark.sources.scram import ScramError, ScramServer

        algo = "sha512" if self.sasl == "scram-sha-512" else "sha256"
        srv = get_scram()
        try:
            if srv is None:
                srv = ScramServer(self.sasl_password, algo=algo)
                return None, (srv, srv.first(auth.decode()).encode())
            return True, srv.final(auth.decode()).encode()
        except ScramError:
            return False, None

    def close(self):
        self._srv.close()


def test_crc32c_known_vectors():
    # RFC 3720 / Castagnoli test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_murmur2_matches_java_client():
    # vectors from org.apache.kafka.common.utils.Utils.murmur2
    assert murmur2(b"21") == -973932308 % (1 << 32)
    assert murmur2(b"foobar") == -790332482 % (1 << 32)
    assert murmur2(b"a-little-bit-long-string") == -985981536 % (1 << 32)


def test_kafka_produce_roundtrip_and_partitioning():
    fake = FakeKafka(n_partitions=3)
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}"})
    sink.open()
    assert sink.partition_count("orders") == 3
    rows = [
        {"key": f"g{i % 4}", "group_id": f"g{i % 4}", "value": json.dumps({"i": i})}
        for i in range(12)
    ]
    sink.deliver(SinkBatch(routing={"topic": "orders"}, rows=rows))
    sink.close()
    assert len(fake.produced) == 12
    # keyed rows land on the murmur2 partition, groups never split
    for topic, partition, key, _value in fake.produced:
        assert topic == "orders"
        assert partition == partition_for_key(key, 3)
    # per-group order preserved (rows arrive in cursor order per group)
    for g in range(4):
        vals = [json.loads(v)["i"] for _, _, k, v in fake.produced if k == f"g{g}"]
        assert vals == sorted(vals)
    fake.close()


def test_kafka_gzip_compression_roundtrip():
    """compression=gzip (kafka_sink.ex:28): the records block is
    gzip-compressed inside the v2 RecordBatch; the fake broker's
    parser verifies the CRC over the wire bytes then decompresses."""
    fake = FakeKafka(n_partitions=1)
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}",
                                 "topic": "t", "compression": "gzip"})
    sink.open()
    rows = [{"key": "g", "value": json.dumps({"i": i, "pad": "x" * 200})}
            for i in range(20)]
    sink.deliver(SinkBatch(routing={"topic": "t"}, rows=rows))
    sink.close()
    fake.close()
    assert [json.loads(v)["i"] for _, _, _, v in fake.produced] == list(range(20))


def test_kafka_gzip_batch_bytes_deterministic_and_smaller():
    from sequin_spark.sinks.kafka import encode_record_batch, parse_record_batch

    records = [(b"k%d" % i, b"v" * 300) for i in range(10)]
    plain = encode_record_batch(records)
    gz1 = encode_record_batch(records, compression="gzip")
    gz2 = encode_record_batch(records, compression="gzip")
    assert gz1 == gz2  # mtime=0 keeps gzip output reproducible
    assert len(gz1) < len(plain)
    assert parse_record_batch(gz1) == records


def test_kafka_snappy_compression_roundtrip():
    """compression=snappy (kafka_sink.ex:28): vendored xerial-framed
    snappy (sinks/snappy_py.py) — batch compresses inside the v2
    RecordBatch and the fake broker parser (CRC verify + decompress)
    recovers every record; no external library needed."""
    fake = FakeKafka(n_partitions=1)
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}",
                                 "topic": "t", "compression": "snappy"})
    sink.open()
    rows = [{"key": "g", "value": json.dumps({"i": i, "pad": "x" * 200})}
            for i in range(20)]
    sink.deliver(SinkBatch(routing={"topic": "t"}, rows=rows))
    sink.close()
    fake.close()
    assert [json.loads(v)["i"] for _, _, _, v in fake.produced] == list(range(20))


def test_kafka_snappy_batch_is_xerial_framed_and_roundtrips():
    """The compressed records block must carry the xerial magic (the
    framing a Kafka JVM consumer's SnappyInputStream requires — raw
    snappy blocks would be rejected), and parse_record_batch must
    recover the records exactly and deterministically."""
    from sequin_spark.sinks.kafka import encode_record_batch, parse_record_batch
    from sequin_spark.sinks.snappy_py import XERIAL_MAGIC

    records = [(b"k%d" % i, b"v" * 300) for i in range(10)]
    sn1 = encode_record_batch(records, compression="snappy")
    sn2 = encode_record_batch(records, compression="snappy")
    assert sn1 == sn2  # pure-Python codec is deterministic
    assert XERIAL_MAGIC in sn1
    assert len(sn1) < len(encode_record_batch(records))
    assert parse_record_batch(sn1) == records


def test_kafka_lz4_compression_roundtrip():
    """compression=lz4 (kafka_sink.ex:28): vendored pure-Python LZ4
    FRAME codec (sinks/lz4_py.py — magic, descriptor, XXH32 header +
    content checksums, the format JVM consumers read); fake-broker
    e2e + deterministic framed batch round-trip."""
    from sequin_spark.sinks.kafka import encode_record_batch, parse_record_batch
    from sequin_spark.sinks.lz4_py import LZ4_MAGIC
    import struct as _struct

    fake = FakeKafka(n_partitions=1)
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}",
                                 "topic": "t", "compression": "lz4"})
    sink.open()
    rows = [{"key": "g", "value": json.dumps({"i": i, "pad": "x" * 200})}
            for i in range(20)]
    sink.deliver(SinkBatch(routing={"topic": "t"}, rows=rows))
    sink.close()
    fake.close()
    assert [json.loads(v)["i"] for _, _, _, v in fake.produced] == list(range(20))

    records = [(b"k%d" % i, b"v" * 300) for i in range(10)]
    fr1 = encode_record_batch(records, compression="lz4")
    assert fr1 == encode_record_batch(records, compression="lz4")
    assert _struct.pack("<I", LZ4_MAGIC) in fr1  # really frame-formatted
    assert len(fr1) < len(encode_record_batch(records))
    assert parse_record_batch(fr1) == records


def test_kafka_unavailable_codec_fails_fast_at_open():
    """When a non-stdlib codec's library is absent, open() must raise
    the honest gate, not fail mid-delivery; when it IS installed the
    probe must pass (skip that codec — both outcomes are correct)."""
    import importlib.util

    from sequin_spark.sinks import zstd_py

    fake = FakeKafka(n_partitions=1)
    # snappy/lz4/zstd-decode are vendored pure-Python; zstd ENCODE is
    # the one remaining gate (needs libzstd via ctypes)
    if zstd_py._libzstd() is None:
        sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}",
                                     "topic": "t", "compression": "zstd"})
        with pytest.raises(NotImplementedError, match="zstd|libzstd"):
            sink.open()
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}",
                                 "topic": "t", "compression": "brotli"})
    with pytest.raises(ValueError, match="brotli"):
        sink.open()
    fake.close()


def test_kafka_produce_error_raises():
    fake = FakeKafka(n_partitions=1, fail_codes=[7])  # REQUEST_TIMED_OUT
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}", "topic": "t"})
    sink.open()
    with pytest.raises(RuntimeError, match="produce error"):
        sink.deliver(SinkBatch(routing={}, rows=[{"key": "k", "value": "v"}]))
    sink.close()
    fake.close()


def test_kafka_delivery_engine_e2e(spark, tmp_path):
    """Full engine → kafka path: group-ordered delivery lands in the
    fake broker with per-group order intact (kafka_pipeline.ex parity)."""
    from sequin_spark.streaming.delivery import DeliveryEngine

    fake = FakeKafka(n_partitions=2)
    df = spark.createDataFrame(
        [
            (f"g{i % 3}", 100 + i, 0, f"ik-{i}", f"g{i % 3}", json.dumps({"n": i}), "events")
            for i in range(30)
        ],
        "group_id string, commit_lsn long, commit_idx long, idempotency_key string, "
        "key string, value string, topic string",
    )
    engine = DeliveryEngine(
        "kafka",
        {"hosts": f"127.0.0.1:{fake.port}"},
        state_dir=str(tmp_path / "state"),
        routing_cols=("topic",),
        partition_count=4,
    )
    stats = engine.process_batch(df, 0)
    assert stats["delivered"] == 30 and stats["failed"] == 0
    assert len(fake.produced) == 30
    for g in range(3):
        ns = [json.loads(v)["n"] for _, _, k, v in fake.produced if k == f"g{g}"]
        assert ns == sorted(ns)
    fake.close()


def test_kafka_zstd_compression_roundtrip():
    """compression=zstd (kafka_sink.ex:28): encode via libzstd
    (ctypes), decode via the vendored pure-Python RFC 8878 decoder
    (sinks/zstd_py.py) — so parse_record_batch here exercises the
    decoder on a REAL library-produced frame, and JVM-producer zstd
    batches decode with no native dependency."""
    import struct as _struct

    from sequin_spark.sinks import zstd_py
    from sequin_spark.sinks.kafka import (
        encode_record_batch,
        parse_record_batch,
    )

    if zstd_py._libzstd() is None:
        pytest.skip("libzstd not available for the encode side")

    fake = FakeKafka(n_partitions=1)
    sink = create_sink("kafka", {"hosts": f"127.0.0.1:{fake.port}",
                                 "topic": "t", "compression": "zstd"})
    sink.open()
    rows = [{"key": "g", "value": json.dumps({"i": i, "pad": "x" * 200})}
            for i in range(20)]
    sink.deliver(SinkBatch(routing={"topic": "t"}, rows=rows))
    sink.close()
    fake.close()
    assert [json.loads(v)["i"] for _, _, _, v in fake.produced] == list(range(20))

    records = [(b"k%d" % i, b"v" * 300) for i in range(10)]
    fr1 = encode_record_batch(records, compression="zstd")
    assert _struct.pack("<I", zstd_py.ZSTD_MAGIC) in fr1
    assert len(fr1) < len(encode_record_batch(records))
    assert parse_record_batch(fr1) == records
