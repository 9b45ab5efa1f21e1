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

__all__ = ["url_host", "url_path", "url_query_param", "registrable_domain"]


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
