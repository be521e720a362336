"""Shared TLS client-context construction for the wire transports
(Postgres replication/sink, Kafka, Redis).

One place for the verify / no-verify decision so a future hardening
change (minimum TLS version, cert pinning) applies to every transport
at once instead of drifting per copy.
"""

from __future__ import annotations


def make_client_context(verify: bool, ssl_context=None):
    """An ``ssl.SSLContext`` for a client connection.

    ``ssl_context`` (when given) always wins — tests and custom-CA
    deployments pass a prepared context.  ``verify=True`` is the
    platform default-verification context; ``verify=False`` encrypts
    without certificate verification (the libpq ``sslmode=require``
    rung — protects against passive snooping only, documented at every
    call site)."""
    import ssl

    if ssl_context is not None:
        return ssl_context
    if verify:
        return ssl.create_default_context()
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.check_hostname = False
    ctx.verify_mode = ssl.CERT_NONE
    return ctx
