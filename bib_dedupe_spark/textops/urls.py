"""URL canonicalization + url/host-level dedup for web-page corpora.

Common-Crawl-style pipelines dedup first on the cheapest key there is:
the URL. Everything here is native column expressions (whole-stage
codegen; no Python), so the canonical-url groupBy is an ordinary
partial-aggregable shuffle at 10^12 rows.

Canonicalization (conservative, lossless for dedup purposes):
  - scheme + host lowercased; DEFAULT ports dropped (http:80 / https:443)
    but non-default ports (e.g. :8080) are KEPT — distinct origins stay
    distinct
  - userinfo (user:pass@) dropped deliberately: it is not part of the
    resource identity for crawl dedup and leaks credentials into keys
  - fragment (#...) dropped
  - tracking params removed (utm_*, fbclid, gclid, msclkid, ref)
  - remaining query params SORTED (order-insensitive compare)
  - trailing '/' stripped from non-root paths
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_host(url: Column | str) -> Column:
    """Lowercased host (authority without port/userinfo).

    IPv6 literals keep their brackets (`[2001:db8::1]`) — the colon
    inside brackets is part of the address, not a port separator.
    """
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(
            c,
            r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/]*@)?(\[[^\]]*\]|[^/:?#]+)",
            1,
        )
    )


def url_port(url: Column | str) -> Column:
    """Explicit port string ('' when absent); IPv6-bracket aware."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(
        c,
        r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/]*@)?(?:\[[^\]]*\]|[^/:?#]+):(\d+)",
        1,
    )


def normalize_url(url: Column | str) -> Column:
    """Canonical form of ``url`` (see module docstring)."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = url_host(c)
    port = url_port(c)
    # keep the port unless it's the scheme's default (http:80 / https:443)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when((port == "") | is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    # path: after authority, before ?/# — strip trailing slash (keep root)
    path = F.regexp_extract(c, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(c, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING),
        )
    )
    qnorm = F.when(F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
        F.lit("")
    )
    return F.concat(scheme, F.lit("://"), host, portpart, path, qnorm)


def dedup_by_url(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"
) -> DataFrame:
    """One row per canonical url: the EARLIEST capture wins.

    min_by aggregation on the canonical key — partial-aggregable, no
    window, no sort; the 10^12-row shape. Matches the first-capture-wins
    convention of the streaming incremental linkage.
    """
    keyed = pages.withColumn("_curl", normalize_url(url_col))
    cols = [c for c in pages.columns]
    agg = keyed.groupBy("_curl").agg(
        *[F.min_by(c, F.col(ts_col)).alias(c) for c in cols]
    )
    return agg.select(F.col("_curl").alias("canonical_url"), *cols)


def host_doc_counts(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Docs per host — the standard crawl-skew observability table."""
    return (
        pages.select(url_host(url_col).alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("n_docs"))
    )


def host_profiles(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-host crawl curation profile: volume, re-crawl rate, text mass.

    The table a crawl pipeline uses to budget hosts (dup-heavy hosts get
    de-prioritized; text-light hosts get dropped). One groupBy on the
    host key — partial-aggregable, no window, the 10^12-row shape.
    Columns: host, n_pages, n_unique_urls, dup_rate (re-crawl fraction),
    total_chars, mean_chars.
    """
    keyed = pages.select(
        url_host(url_col).alias("host"),
        normalize_url(url_col).alias("_curl"),
        F.length(text_col).alias("_chars"),
    )
    return keyed.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("_curl").alias("n_unique_urls"),
        F.round(
            1.0 - F.countDistinct("_curl") / F.count("*"), 6
        ).alias("dup_rate"),
        F.sum("_chars").alias("total_chars"),
        F.round(F.avg("_chars"), 6).alias("mean_chars"),
    )
