"""SCRAM-SHA-256 client (RFC 5802 / RFC 7677) for the Postgres wire.

PostgreSQL ≥10 offers ``SCRAM-SHA-256`` via the SASL authentication
messages and it is the default ``password_encryption`` since PG 14 — a
client with only cleartext/md5 cannot authenticate to a stock modern
server.  The reference inherits SCRAM from Postgrex
(lib/sequin/databases/postgres_database.ex:33-51 passes the connection
opts straight through); this is an original implementation against the
public RFCs.

Scope: channel-binding-none (gs2 header ``n,,`` — the plain
``SCRAM-SHA-256`` mechanism, not ``-PLUS``), which is what libpq uses
on both plain and TLS connections unless channel binding is required.
Passwords are encoded as UTF-8; full SASLprep normalization is out of
scope (ASCII passwords — the overwhelmingly common case — are
unaffected, matching libpq's behavior for unnormalized strings).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os


class ScramError(Exception):
    pass


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


def _hmac(key: bytes, msg: bytes, algo: str = "sha256") -> bytes:
    return hmac.new(key, msg, getattr(hashlib, algo)).digest()


def _xor(a: bytes, b: bytes) -> bytes:
    return bytes(x ^ y for x, y in zip(a, b))


def salted_password(password: str, salt: bytes, iterations: int,
                    algo: str = "sha256") -> bytes:
    """Hi() from RFC 5802 == PBKDF2-HMAC-<algo>.  ``algo`` is sha256
    for Postgres and Kafka SCRAM-SHA-256, sha512 for Kafka
    SCRAM-SHA-512."""
    return hashlib.pbkdf2_hmac(
        algo, password.encode("utf-8"), salt, iterations)


class ScramClient:
    """One SCRAM-SHA-256 exchange: first() → final(server_first) →
    verify_server(server_final).

    ``nonce`` is injectable for deterministic tests (RFC 7677 vectors);
    production callers omit it and get 18 random bytes base64'd, the
    same entropy libpq uses.
    """

    GS2_HEADER = "n,,"  # no channel binding, no authzid

    def __init__(self, username: str = "", password: str = "",
                 nonce: str | None = None, algo: str = "sha256"):
        # Postgres ignores the SCRAM n= attribute (the startup-packet
        # user wins) and libpq sends it empty; we do the same unless a
        # caller (e.g. the RFC test vectors) supplies one.
        self.username = username
        self.password = password
        self.algo = algo
        self.nonce = nonce if nonce is not None else _b64(os.urandom(18))
        self._client_first_bare: str | None = None
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    # -- messages ----------------------------------------------------------

    def first(self) -> str:
        n = self.username.replace("=", "=3D").replace(",", "=2C")
        self._client_first_bare = f"n={n},r={self.nonce}"
        return self.GS2_HEADER + self._client_first_bare

    def final(self, server_first: str) -> str:
        attrs = _attrs(server_first)
        try:
            combined = attrs["r"]
            salt = base64.b64decode(attrs["s"])
            iterations = int(attrs["i"])
        except (KeyError, ValueError) as e:
            raise ScramError(f"malformed server-first: {server_first!r}") from e
        if not combined.startswith(self.nonce):
            raise ScramError("server nonce does not extend client nonce")
        if iterations < 1:
            raise ScramError(f"invalid iteration count {iterations}")
        self._salted = salted_password(
            self.password, salt, iterations, self.algo)
        client_key = _hmac(self._salted, b"Client Key", self.algo)
        stored_key = hashlib.new(self.algo, client_key).digest()
        channel = _b64(self.GS2_HEADER.encode())  # "biws"
        without_proof = f"c={channel},r={combined}"
        assert self._client_first_bare is not None
        self._auth_message = ",".join(
            [self._client_first_bare, server_first, without_proof]
        ).encode()
        proof = _xor(client_key,
                     _hmac(stored_key, self._auth_message, self.algo))
        return f"{without_proof},p={_b64(proof)}"

    def verify_server(self, server_final: str) -> None:
        """Check v= — a wrong server signature means the server does not
        actually know the password derivative (MITM / downgrade)."""
        attrs = _attrs(server_final)
        if "e" in attrs:
            raise ScramError(f"server rejected auth: {attrs['e']}")
        if "v" not in attrs:
            raise ScramError(f"malformed server-final: {server_final!r}")
        assert self._salted is not None and self._auth_message is not None
        server_key = _hmac(self._salted, b"Server Key", self.algo)
        expect = _b64(_hmac(server_key, self._auth_message, self.algo))
        if not hmac.compare_digest(expect, attrs["v"]):
            raise ScramError("server signature mismatch")


def _attrs(message: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in message.split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


class ScramServer:
    """Minimal SCRAM-SHA-256 verifier for the fake walsender/broker
    tests — NOT a production server; it exists so client tests exercise
    a full, honest 4-leg exchange including the server signature."""

    def __init__(self, password: str, iterations: int = 4096,
                 salt: bytes | None = None, nonce_ext: str | None = None,
                 algo: str = "sha256"):
        self.password = password
        self.algo = algo
        self.iterations = iterations
        self.salt = salt if salt is not None else os.urandom(16)
        self.nonce_ext = nonce_ext if nonce_ext is not None else _b64(os.urandom(18))
        self._combined: str | None = None
        self._client_first_bare: str | None = None
        self._server_first: str | None = None

    def first(self, client_first: str) -> str:
        if not client_first.startswith("n,,"):
            raise ScramError("unsupported gs2 header")
        self._client_first_bare = client_first[3:]
        client_nonce = _attrs(self._client_first_bare)["r"]
        self._combined = client_nonce + self.nonce_ext
        self._server_first = (
            f"r={self._combined},s={_b64(self.salt)},i={self.iterations}")
        return self._server_first

    def final(self, client_final: str) -> str:
        attrs = _attrs(client_final)
        if attrs.get("r") != self._combined:
            raise ScramError("nonce mismatch")
        salted = salted_password(
            self.password, self.salt, self.iterations, self.algo)
        client_key = _hmac(salted, b"Client Key", self.algo)
        stored_key = hashlib.new(self.algo, client_key).digest()
        without_proof = client_final.rsplit(",p=", 1)[0]
        auth_message = ",".join(
            [self._client_first_bare or "", self._server_first or "",
             without_proof]).encode()
        proof = base64.b64decode(attrs.get("p", ""))
        recovered_key = _xor(
            proof, _hmac(stored_key, auth_message, self.algo))
        if hashlib.new(self.algo, recovered_key).digest() != stored_key:
            raise ScramError("invalid client proof")
        server_key = _hmac(salted, b"Server Key", self.algo)
        return f"v={_b64(_hmac(server_key, auth_message, self.algo))}"
