"""Dump functions (typed -> str) as native Spark Column expressions.

Mirrors the export formatters of the reference
(``/root/reference/simpletasks_data/formatting.py:14-93``): NULL-safe
serializers used when writing a table back out to CSV/sheets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dump_datetime", "dump_gps", "dump_int", "dump_percentage", "dump_str", "strftime_to_java"]

# Minimal strftime -> java.time pattern translation for the directives the
# reference's users pass to dump_datetime (formatting.py:31-34).
_STRFTIME_MAP = [
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%j", "DDD"),
    ("%z", "xx"),
    ("%%", "%"),
]


def strftime_to_java(fmt: str) -> str:
    # Escape literal runs? The formats used here are separator chars only
    # (/-: T space), which java.time treats as literals already.
    out = fmt
    for py, java in _STRFTIME_MAP:
        out = out.replace(py, java)
    return out


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dump_datetime(col: Column | str, fmt: str = "json") -> Column:
    """Shorthands: ``json`` -> ISO-8601 (no offset for naive/UTC values, as
    ``%z`` renders empty on naive datetimes in the reference), ``gs`` ->
    ``yyyy-MM-dd HH:mm:ss``; anything else is a strftime pattern
    (formatting.py:14-34). NULL -> NULL."""
    if fmt == "json":
        java = "yyyy-MM-dd'T'HH:mm:ss"
    elif fmt == "gs":
        java = "yyyy-MM-dd HH:mm:ss"
    else:
        java = strftime_to_java(fmt)
    return F.date_format(_c(col), java)


def dump_gps(lat: Column | str, lon: Column | str) -> Column:
    """POINT -> ``"lat, lng"`` with %f (6 decimals), NULL-safe
    (formatting.py:37-51). The engine models geography as a
    ``struct<lat double, lon double>`` — pass the two legs."""
    lat_c, lon_c = _c(lat), _c(lon)
    return F.when(
        lat_c.isNotNull() & lon_c.isNotNull(),
        F.format_string("%f, %f", lat_c, lon_c),
    )


def dump_int(col: Column | str) -> Column:
    """NULL -> "0"; else ``{:.0f}`` (formatting.py:54-65). Python's format
    rounds half-to-even, so use bround, not Java's %.0f (HALF_UP)."""
    return F.bround(F.coalesce(_c(col).cast("double"), F.lit(0.0))).cast("decimal(38,0)").cast("string")


def dump_percentage(col: Column | str) -> Column:
    """NULL -> "0.0"; else ``{:.1f}`` of value*100 (formatting.py:68-79).
    Half-to-even like Python's format (bround before rendering)."""
    v = F.bround(F.coalesce(_c(col).cast("double") * 100, F.lit(0.0)), 1)
    return F.format_string("%.1f", v)


def dump_str(col: Column | str) -> Column:
    """NULL/empty/whitespace-only -> "-"; otherwise the *original* string,
    untrimmed (formatting.py:82-93)."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"^\s+|\s+$", "")
    return F.when(c.isNull() | (stripped == ""), F.lit("-")).otherwise(c)
