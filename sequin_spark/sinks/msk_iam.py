"""AWS MSK IAM SASL payload (wire mechanism ``AWS_MSK_IAM``).

Reference: lib/sequin/consumers/kafka_sink.ex:16-28,110-121 —
``sasl_mechanism: :aws_msk_iam`` configured with ``aws_region`` /
``aws_access_key_id`` / ``aws_secret_access_key`` and **TLS required**;
the reference delegates the wire exchange to the aws_msk_iam_auth brod
plugin.  This module implements the same public protocol (the
aws/aws-msk-iam-auth "SignedPayloadGenerator" spec) with stdlib only:

The client sends ONE SaslAuthenticate payload — a JSON object of
lowercase keys carrying an AWS SigV4 *query-parameter style* signature
of a virtual ``GET /`` request against service ``kafka-cluster`` for
action ``kafka-cluster:Connect``:

* canonical request: ``GET`` / ``/`` / the sorted, URI-encoded query
  params (``Action`` + the ``X-Amz-*`` params) / ``host:<broker>`` /
  signed headers ``host`` / ``sha256("")`` (empty payload hash — query
  signing of a bodyless GET);
* string-to-sign and signing-key derivation: standard SigV4
  (``AWS4-HMAC-SHA256``, scope ``date/region/kafka-cluster/
  aws4_request``) — the derivation is pinned by the published AWS test
  vector in tests/test_kafka_auth.py.

The broker replies with a JSON body (``version``/``request-id``) on
success.  ``verify_payload`` implements the server side (recompute the
signature from the presented params with the secret looked up by
access-key id, constant-time compare, host + expiry window checks) so
the fake-broker test authenticates honestly rather than rubber-stamping.
"""

from __future__ import annotations

import hashlib
import hmac
import json
from datetime import datetime, timedelta, timezone
from urllib.parse import quote

_ALGORITHM = "AWS4-HMAC-SHA256"
_SERVICE = "kafka-cluster"
_ACTION = "kafka-cluster:Connect"
_VERSION = "2020_10_22"
_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


class MskIamError(Exception):
    pass


def _uri_encode(s: str) -> str:
    # SigV4 canonical encoding: unreserved = ALPHA / DIGIT / - _ . ~
    return quote(s, safe="-_.~")


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, datestamp: str, region: str,
                service: str = _SERVICE) -> bytes:
    """SigV4 key derivation: HMAC chain AWS4+secret → date → region →
    service → "aws4_request" (pinned by the AWS published vector)."""
    k = _hmac(b"AWS4" + secret_key.encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def _signature(host: str, params: dict[str, str], secret_key: str,
               datestamp: str, amz_date: str, region: str) -> str:
    canonical_qs = "&".join(
        f"{_uri_encode(k)}={_uri_encode(v)}" for k, v in sorted(params.items()))
    canonical_request = "\n".join(
        ["GET", "/", canonical_qs, f"host:{host}", "", "host", _EMPTY_SHA256])
    scope = f"{datestamp}/{region}/{_SERVICE}/aws4_request"
    string_to_sign = "\n".join(
        [_ALGORITHM, amz_date, scope,
         hashlib.sha256(canonical_request.encode()).hexdigest()])
    key = signing_key(secret_key, datestamp, region)
    return hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()


def build_payload(host: str, access_key_id: str, secret_access_key: str,
                  region: str, *, session_token: str | None = None,
                  expires: int = 900, user_agent: str = "sequin-spark",
                  now: datetime | None = None) -> bytes:
    """The single SASL authenticate payload the client sends."""
    now = now or datetime.now(timezone.utc)
    amz_date = now.strftime("%Y%m%dT%H%M%SZ")
    datestamp = now.strftime("%Y%m%d")
    credential = f"{access_key_id}/{datestamp}/{region}/{_SERVICE}/aws4_request"
    params: dict[str, str] = {
        "Action": _ACTION,
        "X-Amz-Algorithm": _ALGORITHM,
        "X-Amz-Credential": credential,
        "X-Amz-Date": amz_date,
        "X-Amz-Expires": str(expires),
        "X-Amz-SignedHeaders": "host",
    }
    if session_token:
        params["X-Amz-Security-Token"] = session_token
    sig = _signature(host, params, secret_access_key, datestamp, amz_date,
                     region)
    payload: dict[str, str] = {
        "version": _VERSION,
        "host": host,
        "user-agent": user_agent,
        "action": _ACTION,
        "x-amz-algorithm": _ALGORITHM,
        "x-amz-credential": credential,
        "x-amz-date": amz_date,
        "x-amz-expires": str(expires),
    }
    if session_token:
        payload["x-amz-security-token"] = session_token
    payload["x-amz-signedheaders"] = "host"
    payload["x-amz-signature"] = sig
    return json.dumps(payload).encode()


def verify_payload(payload: bytes, host: str,
                   secret_for_key: dict[str, str], *,
                   now: datetime | None = None) -> str:
    """Server-side check (fake broker / tests): recompute the signature
    from the presented params with the secret on file for the presented
    access-key id; constant-time compare; enforce host match and the
    Date..Date+Expires validity window.  Returns the access-key id.
    Raises MskIamError on any failure (one generic message — a real
    broker does not reveal which check failed)."""
    try:
        msg = json.loads(payload.decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise MskIamError(f"malformed payload: {e}") from None
    try:
        credential = msg["x-amz-credential"]
        amz_date = msg["x-amz-date"]
        expires = int(msg["x-amz-expires"])
        presented = msg["x-amz-signature"]
        access_key, datestamp, region, service, terminal = credential.split("/")
    except (KeyError, ValueError):
        raise MskIamError("authentication failed") from None
    if (msg.get("version") != _VERSION or msg.get("action") != _ACTION
            or msg.get("host") != host or service != _SERVICE
            or terminal != "aws4_request"
            or not amz_date.startswith(datestamp)):
        raise MskIamError("authentication failed")
    secret = secret_for_key.get(access_key)
    if secret is None:
        raise MskIamError("authentication failed")
    params = {
        "Action": _ACTION,
        "X-Amz-Algorithm": _ALGORITHM,
        "X-Amz-Credential": credential,
        "X-Amz-Date": amz_date,
        "X-Amz-Expires": str(expires),
        "X-Amz-SignedHeaders": "host",
    }
    if msg.get("x-amz-security-token"):
        params["X-Amz-Security-Token"] = msg["x-amz-security-token"]
    expected = _signature(host, params, secret, datestamp, amz_date, region)
    if not hmac.compare_digest(expected, presented):
        raise MskIamError("authentication failed")
    now = now or datetime.now(timezone.utc)
    try:
        signed_at = datetime.strptime(amz_date, "%Y%m%dT%H%M%SZ").replace(
            tzinfo=timezone.utc)
    except ValueError:
        raise MskIamError("authentication failed") from None
    if not (signed_at - timedelta(minutes=5) <= now
            <= signed_at + timedelta(seconds=expires)):
        raise MskIamError("authentication failed")
    return access_key
