"""Kafka SASL (PLAIN / SCRAM-SHA-256 / SCRAM-SHA-512) + TLS.

Reference parity: the kafka sink's auth surface
(lib/sequin/consumers/kafka_sink.ex:16-28 — tls, username, password,
sasl_mechanism) minus aws-msk-iam, which stays an explicit
NotImplementedError.  The fake broker answers SaslHandshake v1 /
SaslAuthenticate v0 per the public protocol and, for SCRAM, runs the
full 4-leg exchange through ScramServer so the client's
server-signature check is honest.
"""

import ssl

import pytest

from sequin_spark.sinks.base import SinkBatch, create_sink

from tests.test_kafka import FakeKafka


def _sink(srv, **extra):
    cfg = {"hosts": f"127.0.0.1:{srv.port}", "topic": "t", **extra}
    s = create_sink("kafka", cfg)
    s.open()
    return s


def _produce_one(sink):
    sink.deliver(SinkBatch(
        rows=[{"key": "g1", "value": "v1"}], routing={"topic": "t"}))


@pytest.mark.parametrize("mech", ["plain", "scram-sha-256", "scram-sha-512"])
def test_sasl_mechanisms_roundtrip(mech):
    srv = FakeKafka(sasl=mech)
    sink = _sink(srv, sasl_mechanism=mech, username="kuser",
                 password="kpass")
    try:
        _produce_one(sink)
        assert srv.authenticated
        assert srv.handshook_mechanism == mech.upper()
        assert srv.produced == [("t", srv.produced[0][1], "g1", "v1")]
    finally:
        sink.close()
        srv.close()


def test_sasl_underscore_mechanism_spelling_accepted():
    """The reference spells mechanisms scram_sha_256 (kafka_sink.ex);
    accept both spellings."""
    srv = FakeKafka(sasl="scram-sha-256")
    sink = _sink(srv, sasl_mechanism="SCRAM_SHA_256", username="kuser",
                 password="kpass")
    try:
        _produce_one(sink)
        assert srv.authenticated
    finally:
        sink.close()
        srv.close()


@pytest.mark.parametrize("mech", ["plain", "scram-sha-256"])
def test_sasl_rejected_credentials(mech):
    srv = FakeKafka(sasl=mech, sasl_password="other")
    try:
        with pytest.raises(RuntimeError, match="SASL authentication failed"):
            _sink(srv, sasl_mechanism=mech, username="kuser",
                  password="kpass")
    finally:
        srv.close()


def test_sasl_mechanism_mismatch_lists_broker_offering():
    srv = FakeKafka(sasl="scram-sha-512")
    try:
        with pytest.raises(RuntimeError, match="SCRAM-SHA-512"):
            _sink(srv, sasl_mechanism="plain", username="u", password="p")
    finally:
        srv.close()


def test_aws_msk_iam_is_explicitly_unsupported():
    srv = FakeKafka()
    try:
        with pytest.raises(NotImplementedError, match="aws-msk-iam"):
            _sink(srv, sasl_mechanism="aws_msk_iam")
    finally:
        srv.close()


def test_unknown_mechanism_rejected():
    srv = FakeKafka()
    try:
        with pytest.raises(ValueError, match="sasl_mechanism"):
            _sink(srv, sasl_mechanism="kerberos")
    finally:
        srv.close()


def test_tls_plus_scram_e2e(tmp_path):
    from tests.test_replication_auth import _self_signed

    server_ctx, cert_pem = _self_signed(tmp_path)
    srv = FakeKafka(sasl="scram-sha-256", ssl_ctx=server_ctx)
    client_ctx = ssl.create_default_context(cafile=str(cert_pem))
    sink = _sink(srv, tls=True, ssl_context=client_ctx,
                 sasl_mechanism="scram-sha-256", username="kuser",
                 password="kpass")
    try:
        _produce_one(sink)
        assert srv.authenticated
        assert srv.produced[0][3] == "v1"
    finally:
        sink.close()
        srv.close()


def test_tls_insecure_skips_verification(tmp_path):
    from tests.test_replication_auth import _self_signed

    server_ctx, _ = _self_signed(tmp_path)
    srv = FakeKafka(ssl_ctx=server_ctx)
    sink = _sink(srv, tls=True, tls_insecure=True)
    try:
        _produce_one(sink)
        assert srv.produced[0][2:] == ("g1", "v1")
    finally:
        sink.close()
        srv.close()


def test_tls_untrusted_cert_fails(tmp_path):
    from tests.test_replication_auth import _self_signed

    server_ctx, _ = _self_signed(tmp_path)
    srv = FakeKafka(ssl_ctx=server_ctx)
    try:
        with pytest.raises(ssl.SSLError):
            _sink(srv, tls=True)
    finally:
        srv.close()
