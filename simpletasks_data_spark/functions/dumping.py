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


_FMT_UDFS: dict = {}


def _py_format_float(col: Column, decimals: int) -> Column:
    """Python's ``'%.Nf'`` fixed-point rendering, EXACTLY. No JVM
    primitive can reproduce it: both ``Formatter`` ``%f`` and
    ``bround``/BigDecimal.valueOf work from the double's SHORTEST decimal
    repr, not its exact binary value — so the double nearest -12.45
    (exactly -12.4499999999999992895...) renders "-12.5" under java %f
    (shortest repr "-12.45", HALF_UP) and "-12.4" under bround
    (half-even on the same repr), while python's correctly-rounded
    conversion gives "-12.4" / rounds exact dyadic ties half-even
    (both failure classes caught by test_dumping_fuzz). That makes this
    a python-grammar-bound rendering, the same category as formatList —
    implemented as the sanctioned Arrow-vectorized pandas_udf
    (ArrowEvalPython, lint-clean; the export surface is report
    rendering, never a corpus-scale hot path)."""
    udf = _FMT_UDFS.get(decimals)
    if udf is None:
        fmt = f"%.{decimals}f"

        @F.pandas_udf("string")
        def render(v):  # pd.Series -> pd.Series
            return v.map(lambda x: None if x is None else fmt % x)

        udf = _FMT_UDFS[decimals] = render
    # NULL and NaN are indistinguishable inside the udf (a NULL double
    # arrives in the float64 pandas batch as NaN), so NULL is screened
    # JVM-side; a genuine NaN then renders python-style as "nan"/"-nan"
    # — matching the reference's '{:.Nf}'.format(nan) — not NULL.
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(udf(col))


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
        F.concat(
            _py_format_float(lat_c, 6), F.lit(", "), _py_format_float(lon_c, 6)
        ),
    )


def dump_int(col: Column | str) -> Column:
    """NULL -> "0"; else ``{:.0f}`` (formatting.py:54-65) — correctly
    rounded with half-to-even ties, INCLUDING python's "-0" rendering of
    negative fractions that round to zero."""
    return _py_format_float(F.coalesce(_c(col).cast("double"), F.lit(0.0)), 0)


def dump_percentage(col: Column | str) -> Column:
    """NULL -> "0.0"; else ``{:.1f}`` of value*100 (formatting.py:68-79),
    correctly rounded with half-to-even ties (see _py_format_float)."""
    return _py_format_float(F.coalesce(_c(col).cast("double") * 100, F.lit(0.0)), 1)


def dump_str(col: Column | str) -> Column:
    """NULL/empty/whitespace-only -> "-"; otherwise the *original* string,
    untrimmed (formatting.py:82-93). The blank test uses python's
    str.strip() whitespace set — java's default ``\\s`` is ASCII-only and
    kept NBSP-only strings (caught by test_dumping_fuzz); ``(?U)`` makes
    ``\\s`` the Unicode White_Space class (NBSP, em/ideographic spaces;
    python additionally strips \\x1c-\\x1f — out of the data contract)."""
    c = _c(col)
    stripped = F.regexp_replace(c, r"(?U)^\s+|\s+$", "")
    return F.when(c.isNull() | (stripped == ""), F.lit("-")).otherwise(c)
