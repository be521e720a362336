"""SCRAM-SHA-256 + TLS on the replication client.

RFC 7677 §3 test vectors pin the SCRAM math; the FakeWalSender
exercises the full PG wire framing (AuthenticationSASL / SASLContinue /
SASLFinal 'R' messages, 'p' responses) and the SSLRequest dance.

Reference parity: sequin gets SCRAM and ssl from Postgrex connection
opts (lib/sequin/databases/postgres_database.ex:33-51); this is the
equivalent capability implemented against the public RFCs/protocol.
"""

import ssl
import struct

import pytest

from sequin_spark.sources.replication import ReplicationClient, ReplicationError
from sequin_spark.sources.scram import ScramClient, ScramError, ScramServer

from tests.test_replication import FakeWalSender, wal_script

pytestmark = pytest.mark.usefixtures()


# --- RFC 7677 vectors -----------------------------------------------------

V_NONCE = "rOprNGfwEbeRWgbNEkqO"
V_SERVER_FIRST = ("r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
                  "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
V_CLIENT_FINAL = ("c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
                  "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
V_SERVER_FINAL = "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="


def test_scram_rfc7677_vectors():
    c = ScramClient(username="user", password="pencil", nonce=V_NONCE)
    assert c.first() == "n,,n=user,r=" + V_NONCE
    assert c.final(V_SERVER_FIRST) == V_CLIENT_FINAL
    c.verify_server(V_SERVER_FINAL)  # must not raise


def test_scram_rejects_tampered_server_signature():
    c = ScramClient(username="user", password="pencil", nonce=V_NONCE)
    c.first()
    c.final(V_SERVER_FIRST)
    with pytest.raises(ScramError, match="signature"):
        c.verify_server("v=AAAATRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")


def test_scram_rejects_nonce_truncation():
    """A server echoing a DIFFERENT nonce (not an extension of ours) is
    replaying a captured exchange — must be refused before any proof."""
    c = ScramClient(password="pencil", nonce="abcdef")
    c.first()
    with pytest.raises(ScramError, match="nonce"):
        c.final("r=zzz,s=QSXCR+Q6sek8bf92,i=4096")


def test_scram_client_server_roundtrip_random_nonces():
    c = ScramClient(password="hunter2")
    s = ScramServer("hunter2")
    server_final = s.final(c.final(s.first(c.first())))
    c.verify_server(server_final)


def test_scram_server_rejects_wrong_password():
    c = ScramClient(password="wrong")
    s = ScramServer("hunter2")
    with pytest.raises(ScramError, match="proof"):
        s.final(c.final(s.first(c.first())))


# --- wire-level SCRAM against the fake walsender --------------------------

def test_client_authenticates_via_scram_wire():
    srv = FakeWalSender(wal_script(), auth="scram")
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05)
    try:
        client.connect()
        assert srv.sasl_mechanism == "SCRAM-SHA-256"
        ident = client.identify_system()
        assert ident["timeline"] == 1
    finally:
        client.close()
        srv.close()


def test_client_scram_wrong_password_raises():
    srv = FakeWalSender(wal_script(), auth="scram", password="other")
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05)
    try:
        with pytest.raises(ReplicationError, match="authentication failed"):
            client.connect()
    finally:
        client.close()
        srv.close()


# --- TLS ------------------------------------------------------------------

def _self_signed(tmp_path):
    """Self-signed cert for 127.0.0.1 (SAN IP) via `cryptography`."""
    crypto = pytest.importorskip("cryptography")  # noqa: F841
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "fake-walsender")])
    now = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=3650))
        .add_extension(x509.SubjectAlternativeName(
            [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]),
            critical=False)
        .sign(key, hashes.SHA256())
    )
    cert_pem = tmp_path / "cert.pem"
    key_pem = tmp_path / "key.pem"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(key.private_bytes(
        serialization.Encoding.PEM, serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption()))
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(str(cert_pem), str(key_pem))
    return ctx, cert_pem


def test_tls_require_with_scram_e2e(tmp_path):
    """ssl_mode=require: SSLRequest → 'S' → TLS wrap → SCRAM auth →
    queries over the encrypted channel."""
    server_ctx, _ = _self_signed(tmp_path)
    srv = FakeWalSender(wal_script(), auth="scram", ssl_ctx=server_ctx)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05, ssl_mode="require")
    try:
        client.connect()
        assert client.tls_active
        assert client.identify_system()["xlogpos"] == "0/5000"
        assert srv.startup_params["replication"] == "database"
    finally:
        client.close()
        srv.close()


def test_tls_verify_full_with_trusted_ca(tmp_path):
    server_ctx, cert_pem = _self_signed(tmp_path)
    srv = FakeWalSender(wal_script(), ssl_ctx=server_ctx)
    client_ctx = ssl.create_default_context(cafile=str(cert_pem))
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05, ssl_mode="verify-full",
        ssl_context=client_ctx)
    try:
        client.connect()
        assert client.tls_active
        assert client.identify_system()["timeline"] == 1
    finally:
        client.close()
        srv.close()


def test_tls_verify_full_untrusted_cert_fails(tmp_path):
    server_ctx, _ = _self_signed(tmp_path)
    srv = FakeWalSender(wal_script(), ssl_ctx=server_ctx)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05, ssl_mode="verify-full")
    try:
        with pytest.raises(ssl.SSLError):
            client.connect()
    finally:
        client.close()
        srv.close()


def test_tls_required_but_server_refuses():
    srv = FakeWalSender(wal_script(), ssl_refuse=True)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05, ssl_mode="require")
    try:
        with pytest.raises(ReplicationError, match="refused SSL"):
            client.connect()
    finally:
        client.close()
        srv.close()


def test_tls_prefer_falls_back_to_cleartext():
    srv = FakeWalSender(wal_script(), ssl_refuse=True)
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="replicator", database="postgres",
        password="s3cret", receive_timeout=0.05, ssl_mode="prefer")
    try:
        client.connect()
        assert not client.tls_active
        assert client.identify_system()["timeline"] == 1
    finally:
        client.close()
        srv.close()


def test_bad_ssl_mode_rejected():
    with pytest.raises(ValueError, match="ssl_mode"):
        ReplicationClient("h", 5432, user="u", database="d", ssl_mode="yes")


def test_sasl_without_supported_mechanism_raises():
    """Server advertising only SCRAM-SHA-256-PLUS (channel binding we
    don't implement) must produce a clear error, not a hang."""
    import socket
    import threading

    from tests.test_replication import msg

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    port = s.getsockname()[1]

    def serve():
        conn, _ = s.accept()
        rd = conn.makefile("rb")
        (ln,) = struct.unpack(">i", rd.read(4))
        rd.read(ln - 4)
        conn.sendall(msg(
            b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256-PLUS\x00\x00"))
        conn.recv(4096)
        conn.close()

    threading.Thread(target=serve, daemon=True).start()
    client = ReplicationClient(
        "127.0.0.1", port, user="u", database="d", password="p")
    try:
        with pytest.raises(ReplicationError, match="mechanism"):
            client.connect()
    finally:
        client.close()
        s.close()


def test_malformed_scram_payload_raises_replication_error():
    """A garbage SASL server-first (proxy mid-restart) must surface as
    ReplicationError — the exception class run_supervised's
    backoff-retry catches — never a raw ScramError that would kill the
    supervision loop."""
    from tests.test_replication import FakeWalSender

    srv = FakeWalSender([], auth="scram_garbage")
    client = ReplicationClient(
        "127.0.0.1", srv.port, user="u", database="d", password="s3cret")
    try:
        with pytest.raises(ReplicationError, match="SCRAM"):
            client.connect()
    finally:
        client.close()
        srv.close()
