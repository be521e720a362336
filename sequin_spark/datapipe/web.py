"""Web-corpus URL operators: canonicalization + URL-level dedup.

Crawled training corpora carry one URL per document; the first dedup
pass every web pipeline runs (CommonCrawl/C4/RefinedWeb lineage) is
URL-level: normalize away the noise that makes the same page appear
under many addresses — scheme, ``www.`` prefix, fragments, tracking
query parameters, parameter order, trailing slashes — then keep one
document per canonical URL.

All pure Catalyst string/array built-ins — no regex in the hot path and
no Python UDFs. The only shuffle in ``url_dedup`` is the window/groupBy
on the canonical-URL hash, uniformly distributed, exactly the shape of
exact_dedup — holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# query parameters that never identify content (analytics/click tracking)
TRACKING_PARAMS = ("utm_", "ref=", "fbclid=", "gclid=", "mc_cid=", "mc_eid=")


def canonicalize_url(col: Column) -> Column:
    """Canonical form of a URL:

    - lowercase; fragment (``#...``) dropped
    - scheme dropped (``http://`` == ``https://``)
    - leading ``www.`` dropped
    - tracking params (utm_*, ref, fbclid, gclid, mc_*) dropped
    - remaining query params sorted (``?b=2&a=1`` == ``?a=1&b=2``)
    - trailing slash on the path dropped
    """
    x = F.lower(col)
    x = F.substring_index(x, "#", 1)           # strip fragment
    x = F.substring_index(x, "://", -1)        # strip scheme (if any)
    x = F.when(x.startswith("www."), x.substr(F.lit(5), F.length(x))).otherwise(x)
    path = F.substring_index(x, "?", 1)
    path = F.when(
        path.endswith("/") & (F.length(path) > 1),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.when(x.contains("?"), F.substring_index(x, "?", -1)).otherwise(F.lit(""))
    def _is_tracking(p: Column) -> Column:
        out = F.lit(False)
        for t in TRACKING_PARAMS:
            out = out | p.startswith(t)
        return out

    kept = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: (p != "") & ~_is_tracking(p))
    )
    return F.concat(
        path,
        F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&")))
        .otherwise(F.lit("")),
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """Per-document URL dedup verdict: canonical URL, the kept (minimum
    id) document for that URL, and an ``is_dup`` flag.

    One shuffle on the canonical URL (window min) — same scale shape as
    exact content dedup; the canonical key is near-uniform.
    """
    from pyspark.sql import Window

    canon = canonicalize_url(F.col(url_col)).alias("canonical_url")
    w = Window.partitionBy("canonical_url")
    return (
        df.select(id_col, url_col, canon)
        .withColumn("keep_id", F.min(id_col).over(w))
        .withColumn("is_dup", F.col(id_col) != F.col("keep_id"))
    )


def domain_of(col: Column) -> Column:
    """Registrable host of a URL for per-domain policies: lowercase,
    scheme stripped, everything from the first ``/``, ``?`` or ``#`` on
    dropped, then userinfo (``user:pass@``), a trailing ``:port`` and a
    leading ``www.`` removed — so ``heavy.com``, ``heavy.com:8080`` and
    ``user@heavy.com`` all count as one domain and per-domain caps
    can't be evaded by varying port/userinfo in crawl URLs.

    The scheme strip is an ANCHORED prefix removal — taking text after
    the last ``://`` would attribute ``https://a.com/r?next=https://
    evil.com`` to the embedded (attacker-controllable) domain and
    defeat the cap. Userinfo/port strips happen AFTER the path/query
    truncation: an ``@`` or ``:`` inside a path or query must not cut
    the host. (Bracketed IPv6 literal hosts are out of scope — crawl
    corpora key on registrable names.)"""
    x = F.lower(col)
    x = F.regexp_replace(x, r"^[a-z0-9+.-]+://", "")
    x = F.substring_index(x, "/", 1)
    x = F.substring_index(x, "?", 1)
    x = F.substring_index(x, "#", 1)
    x = F.substring_index(x, "@", -1)   # drop userinfo
    x = F.substring_index(x, ":", 1)    # drop port
    return F.when(
        x.startswith("www."), x.substr(F.lit(5), F.length(x))
    ).otherwise(x)


def domain_caps(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style per-domain document cap: keep at most ``max_per_domain``
    docs per registrable domain (deterministic — lowest ids win), so a
    single crawl-heavy host can't dominate the corpus mix.

    One window shuffle keyed by domain. Domains are the natural unit of
    crawl skew — a monster domain still ranks inside one partition, but
    ranking truncates at the cap so the output is bounded; if one host
    is a large fraction of the entire corpus, pre-filter it by count
    (a groupBy the size of the domain table) before ranking.

    Returns (id, domain, domain_rank, keep) for every input row.
    """
    w = Window.partitionBy("domain").orderBy(id_col)
    return (
        df.select(F.col(id_col), domain_of(F.col(url_col)).alias("domain"))
        .withColumn("domain_rank", F.row_number().over(w))
        .withColumn("keep", F.col("domain_rank") <= max_per_domain)
    )
