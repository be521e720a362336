"""Kafka SASL (PLAIN / SCRAM-SHA-256 / SCRAM-SHA-512 / AWS_MSK_IAM)
+ TLS.

Reference parity: the kafka sink's full auth surface
(lib/sequin/consumers/kafka_sink.ex:16-28 — tls, username, password,
sasl_mechanism incl. :aws_msk_iam with aws_region/access key fields).
The fake broker answers SaslHandshake v1 / SaslAuthenticate v0 per the
public protocol; for SCRAM it runs the full 4-leg exchange through
ScramServer, and for MSK IAM it recomputes the SigV4 signature from
the presented params — so the client's auth is verified honestly, not
rubber-stamped.
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


def test_sigv4_signing_key_matches_aws_published_vector():
    """The AWS docs' SigV4 key-derivation example (secret
    wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY, 20120215/us-east-1/iam)
    pins the HMAC chain independently of our own code."""
    from sequin_spark.sinks.msk_iam import signing_key

    k = signing_key("wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
                    "20120215", "us-east-1", service="iam")
    assert k.hex() == ("f4780e2d9f65fa895f9c67b32ce1baf0"
                       "b0d8a43505a000a1a9e090d414db404d")


def test_msk_iam_payload_shape_and_self_verify():
    from datetime import datetime, timezone
    import json as _json

    from sequin_spark.sinks.msk_iam import (
        MskIamError, build_payload, verify_payload)

    now = datetime(2026, 8, 14, 12, 0, 0, tzinfo=timezone.utc)
    p = build_payload("b-1.example.kafka.us-east-1.amazonaws.com",
                      "AKIAEXAMPLE", "secret", "us-east-1",
                      session_token="tok123", now=now)
    msg = _json.loads(p.decode())
    assert msg["version"] == "2020_10_22"
    assert msg["action"] == "kafka-cluster:Connect"
    assert msg["x-amz-date"] == "20260814T120000Z"
    assert msg["x-amz-credential"].endswith(
        "/20260814/us-east-1/kafka-cluster/aws4_request")
    assert msg["x-amz-signedheaders"] == "host"
    assert msg["x-amz-security-token"] == "tok123"
    key = verify_payload(p, "b-1.example.kafka.us-east-1.amazonaws.com",
                         {"AKIAEXAMPLE": "secret"}, now=now)
    assert key == "AKIAEXAMPLE"
    # wrong secret on file, wrong host, expired clock: all rejected
    for args in [
        (p, "b-1.example.kafka.us-east-1.amazonaws.com", {"AKIAEXAMPLE": "x"},
         {"now": now}),
        (p, "other-host", {"AKIAEXAMPLE": "secret"}, {"now": now}),
        (p, "b-1.example.kafka.us-east-1.amazonaws.com",
         {"AKIAEXAMPLE": "secret"},
         {"now": datetime(2026, 8, 14, 13, 0, 0, tzinfo=timezone.utc)}),
    ]:
        with pytest.raises(MskIamError):
            verify_payload(args[0], args[1], args[2], **args[3])


def test_aws_msk_iam_roundtrip_over_tls(tmp_path):
    """Full e2e: TLS handshake, AWS_MSK_IAM SaslHandshake + signed
    payload verified server-side by signature recomputation, then a
    produce."""
    from tests.test_replication_auth import _self_signed

    server_ctx, cert_pem = _self_signed(tmp_path)
    srv = FakeKafka(sasl="aws-msk-iam", ssl_ctx=server_ctx,
                    iam_secrets={"AKIAEXAMPLE": "topsecret"})
    client_ctx = ssl.create_default_context(cafile=str(cert_pem))
    client_ctx.check_hostname = False  # cert CN is localhost-ish
    sink = _sink(srv, tls=True, ssl_context=client_ctx,
                 sasl_mechanism="aws_msk_iam",
                 aws_access_key_id="AKIAEXAMPLE",
                 aws_secret_access_key="topsecret",
                 aws_region="us-east-1")
    try:
        _produce_one(sink)
        assert srv.authenticated
        assert srv.handshook_mechanism == "AWS_MSK_IAM"
        assert srv.produced[0][3] == "v1"
    finally:
        sink.close()
        srv.close()


def test_aws_msk_iam_wrong_secret_rejected(tmp_path):
    from tests.test_replication_auth import _self_signed

    server_ctx, cert_pem = _self_signed(tmp_path)
    srv = FakeKafka(sasl="aws-msk-iam", ssl_ctx=server_ctx,
                    iam_secrets={"AKIAEXAMPLE": "topsecret"})
    client_ctx = ssl.create_default_context(cafile=str(cert_pem))
    client_ctx.check_hostname = False
    try:
        with pytest.raises(RuntimeError, match="SASL authentication failed"):
            _sink(srv, tls=True, ssl_context=client_ctx,
                  sasl_mechanism="aws_msk_iam",
                  aws_access_key_id="AKIAEXAMPLE",
                  aws_secret_access_key="WRONG",
                  aws_region="us-east-1")
    finally:
        srv.close()


def test_aws_msk_iam_requires_tls_like_reference():
    """kafka_sink.ex:110-121 — tls is required with :aws_msk_iam; the
    signed payload is a bearer credential."""
    srv = FakeKafka()
    try:
        with pytest.raises(ValueError, match="tls"):
            _sink(srv, sasl_mechanism="aws_msk_iam",
                  aws_access_key_id="AKIA", aws_secret_access_key="s",
                  aws_region="us-east-1")
        with pytest.raises(ValueError, match="aws_region"):
            _sink(srv, tls=True, sasl_mechanism="aws_msk_iam",
                  aws_access_key_id="AKIA", aws_secret_access_key="s")
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
