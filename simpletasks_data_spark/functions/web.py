"""URL parsing for web-corpus pipelines (host/domain extraction is the
unit of politeness grouping, per-site dedup, and domain mixing in crawl
processing).

Spark-first: ``F.parse_url`` (JVM-side, java.net.URI semantics) rather
than a Python UDF. The reference engine has no URL surface; this belongs
to the training-data extension set. All helpers return NULL on
unparseable input — filter or coalesce at the call site.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_host", "url_path", "url_query_param", "registrable_domain", "canonical_url"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_host(url: Column | str) -> Column:
    """Hostname (no scheme/port/path): parse_url HOST."""
    return F.parse_url(_c(url), F.lit("HOST"))


def url_path(url: Column | str) -> Column:
    return F.parse_url(_c(url), F.lit("PATH"))


def url_query_param(url: Column | str, key: str) -> Column:
    """Value of one query-string key (NULL when absent)."""
    return F.parse_url(_c(url), F.lit("QUERY"), F.lit(key))


def registrable_domain(host: Column | str, levels: int = 2) -> Column:
    """Last ``levels`` labels of a hostname — a pragmatic eTLD+1 stand-in
    (a real implementation needs the public-suffix list; two labels is
    the common crawl-pipeline approximation for .com/.org-style TLDs)."""
    h = _c(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.when(
        n <= levels, h
    ).otherwise(F.array_join(F.slice(parts, n - levels + 1, levels), "."))


TRACKING_PARAM_RE = r"^(utm_|fbclid|gclid|msclkid|ref$|ref=)"


def canonical_url(url: Column | str) -> Column:
    """Canonical form for crawl dedup: lowercase scheme+authority, strip
    the fragment, drop tracking query params (utm_*/fbclid/gclid/
    msclkid/ref), SORT the surviving params (order never distinguishes
    resources), collapse trailing slashes in the path (root stays '/').
    Pure JVM expressions (parse_url + array ops) — the canonical string
    is the dedup/bloom/partition key for 100 TB crawl frontiers, so it
    must never pay a Python round-trip.

    AUTHORITY, not HOST: host:port must survive canonicalization —
    http://host:8080/x and http://host/x are distinct resources and
    HOST would falsely merge them. Only the host:port half (after the
    last '@') is case-folded; userinfo, when present, is kept verbatim
    (usernames can be case-sensitive)."""
    u = _c(url)
    scheme = F.lower(F.parse_url(u, F.lit("PROTOCOL")))
    auth = F.parse_url(u, F.lit("AUTHORITY"))
    hostport = F.lower(F.element_at(F.split(auth, "@"), -1))
    userinfo = F.when(
        auth.contains("@"),
        F.concat(F.regexp_replace(auth, "@[^@]*$", ""), F.lit("@")),
    ).otherwise(F.lit(""))
    host = F.concat(userinfo, hostport)
    path = F.regexp_replace(F.parse_url(u, F.lit("PATH")), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.parse_url(u, F.lit("QUERY"))
    kept = F.array_join(
        F.sort_array(
            F.filter(
                F.split(F.coalesce(q, F.lit("")), "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )
