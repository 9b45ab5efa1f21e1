"""Parse functions (str -> typed) as native Spark Column expressions.

Re-expresses the reference's scalar parser library
(``/root/reference/simpletasks_data/formatting.py:96-425``) Spark-first:
every parser is a *Column-in, Column-out* recipe built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen — no
Python UDFs in the hot path.

Error model
-----------
The reference distinguishes two failure shapes:

- parsers that swallow errors and return ``None`` (``str2intnullable``,
  ``formatting.py:240-244``) — a NULL result is a *legitimate value*;
- parsers that RAISE ``ValueError`` on garbage (``parseShittyDate``,
  ``formatting.py:327-338``) — the import loop catches the exception and
  keeps the old value (``importtask.py:278-284``).

NULL alone cannot encode both, so every parser here is a
:class:`SparkParser` carrying two expressions: ``value(col)`` (the parsed
value, NULL on failure) and ``err(col)`` (TRUE exactly where the reference
parser would have raised). The merge planner routes ``err`` rows to the
keep-old-value branch and the warn counters.

Known, documented divergences from CPython parsing (all out-of-golden-test
scope): ``int("1_0")``/unicode digits are rejected here; a date whose
*second* fallback format also fails yields err=TRUE instead of aborting the
import.
"""

from __future__ import annotations

import datetime
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "SparkParser",
    "py_strip",
    "str2bool",
    "str2boolnullable",
    "str2strnullable",
    "create_str2strnullable",
    "str2intnullable",
    "str2floatnullable",
    "format_montant",
    "str2intamount",
    "str2floatamount",
    "parse_shitty_date",
    "parse_shitty_date_as_date",
    "parse_shitty_datetime",
    "parse_shitty_time",
]

# Python's int() grammar (sans underscores): optional sign + digits.
_INT_RE = r"^[+-]?[0-9]+$"
# datetime.max / date.max — the reference maps the "10000-01-01" sentinel to
# datetime.datetime.max (formatting.py:336-337, 404-405).
_MAX_TS = "9999-12-31 23:59:59.999999"
_TRUE_WORDS = ("yes", "true", "t", "1", "oui", "vrai")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def py_strip(col: Column | str) -> Column:
    """``str.strip()`` equivalent: ``(?U)`` upgrades java's ASCII-only
    ``\\s`` to the Unicode White_Space class (NBSP, NEL, em/ideographic
    spaces...), matching python's strip set (which additionally covers
    \\x1c-\\x1f — outside the data contract)."""
    return F.regexp_replace(_c(col), r"(?U)^\s+|\s+$", "")


class SparkParser:
    """A parse recipe: ``value(col)`` -> typed Column, ``err(col)`` -> boolean
    Column true where the reference parser would raise (see module docstring).
    """

    def __init__(
        self,
        value: Callable[[Column], Column],
        err: Optional[Callable[[Column], Column]] = None,
        name: str = "parser",
    ) -> None:
        self._value = value
        self._err = err
        self.name = name

    def value(self, col: Column | str) -> Column:
        return self._value(_c(col))

    def err(self, col: Column | str) -> Column:
        if self._err is None:
            return F.lit(False)
        return self._err(_c(col))

    def __call__(self, col: Column | str) -> Column:
        return self.value(col)


# ---------------------------------------------------------------------------
# Booleans — formatting.py:167-192
# ---------------------------------------------------------------------------

def str2bool(col: Column | str) -> Column:
    """ci membership in {yes,true,t,1,oui,vrai}; anything else (incl. empty)
    is false. No trimming — ``" true"`` is false, as in the reference."""
    return F.coalesce(F.lower(_c(col)).isin(*_TRUE_WORDS), F.lit(False))


def _str2boolnullable_value(col: Column) -> Column:
    # Empty/NULL -> NULL *before* any trimming: str2boolnullable(" ") is
    # False, not NULL (formatting.py:192; golden tests/formatting_test.py:104).
    return F.when(col.isNull() | (col == ""), F.lit(None).cast("boolean")).otherwise(
        F.lower(col).isin(*_TRUE_WORDS)
    )


str2boolnullable = SparkParser(_str2boolnullable_value, name="str2boolnullable")


# ---------------------------------------------------------------------------
# Strings — formatting.py:195-228
# ---------------------------------------------------------------------------

def str2strnullable(col: Column | str, maxlength: Optional[int] = None) -> Column:
    """Trim; empty/whitespace-only -> NULL; truncate to ``maxlength``."""
    base = F.nullif(py_strip(col), F.lit(""))
    if maxlength is not None:
        base = F.substring(base, 1, maxlength)
    return base


def create_str2strnullable(length: Optional[int]) -> SparkParser:
    return SparkParser(
        lambda c: str2strnullable(c, maxlength=length),
        name=f"str2strnullable[{length}]",
    )


# ---------------------------------------------------------------------------
# Numbers — formatting.py:231-297
# ---------------------------------------------------------------------------

def _str2intnullable_value(col: Column) -> Column:
    # Python int() rejects decimals: int("42.56") raises -> NULL. A bare
    # Spark cast would return 42, so guard with the int grammar
    # (formatting.py:240-244; golden tests/formatting_test.py:138).
    t = py_strip(col)
    return F.when(t.rlike(_INT_RE), t.cast("long"))


# int(None.strip()) raises AttributeError in the reference (only ValueError
# is caught, formatting.py:240-244) -> NULL input is err (keep-old), while a
# non-int string swallows to a legitimate NULL.
str2intnullable = SparkParser(
    _str2intnullable_value, lambda c: c.isNull(), name="str2intnullable"
)


def _str2floatnullable_value(col: Column) -> Column:
    # Python float() accepts everything a lenient double cast does; non-ANSI
    # try_cast yields NULL on failure, matching the except-return-None.
    return py_strip(col).try_cast("double")


# float(None.strip()) -> AttributeError, same as the int case.
str2floatnullable = SparkParser(
    _str2floatnullable_value, lambda c: c.isNull(), name="str2floatnullable"
)


def format_montant(col: Column | str, shitty_format: str = "en_US") -> Column:
    """Amount normalizer (formatting.py:134-164): ``(x)`` -> ``-x``; en_US
    strips ``,`` thousands / fr_FR turns ``,`` into ``.``; strips all spaces
    incl. NBSP; NULL/empty/``-`` -> ``"0"``. Returns a *string* column."""
    c = _c(col)
    v = py_strip(c)
    parens = F.concat(F.lit("-"), F.translate(v, "()", ""))
    v2 = F.when(v.contains("("), parens).otherwise(v)
    if shitty_format == "en_US":
        v3 = F.replace(v2, F.lit(","), F.lit(""))
    else:
        v3 = F.replace(v2, F.lit(","), F.lit("."))
    v4 = F.translate(v3, "  ", "")
    return (
        F.when(c.isNull() | (v == ""), F.lit("0"))
        .when((v4 == "") | (v4 == "-"), F.lit("0"))
        .otherwise(v4)
    )


def str2intamount(col: Column | str, shitty_format: str = "en_US") -> Column:
    """``int(formatMontant(v))``; failure -> 0, not NULL (formatting.py:247-262).
    ``"-1,000.0"`` -> formatted ``"-1000.0"`` -> int() fails -> 0."""
    m = format_montant(col, shitty_format)
    return F.when(m.rlike(_INT_RE), m.cast("long")).otherwise(F.lit(0))


def str2floatamount(col: Column | str, shitty_format: str = "en_US") -> Column:
    """``float(formatMontant(v))``; failure -> 0.0 (formatting.py:282-297)."""
    m = format_montant(col, shitty_format)
    return F.coalesce(m.try_cast("double"), F.lit(0.0))


# ---------------------------------------------------------------------------
# Dates — formatting.py:300-425
# ---------------------------------------------------------------------------

def _try_ts(col: Column, fmt: str) -> Column:
    return F.try_to_timestamp(col, F.lit(fmt))


def _shitty_date_value(col: Column, shitty_format: str, with_time: bool) -> Column:
    """Shared body of parseShittyDate / parseShittyDateTime
    (formatting.py:300-338, 360-406): branch on ``/`` vs ``.`` vs ISO;
    locale decides which of day-first / month-first is tried first; the
    ``10000-01-01`` sentinel maps to datetime.max."""
    t = py_strip(col)
    suffix = " H:m:s" if with_time else ""
    day_first = shitty_format == "fr_FR"
    if day_first:
        slash1, slash2 = "d/M/yyyy", "M/d/yyyy"
        dot1, dot2 = "d.M.yyyy", "M.d.yyyy"
    else:
        slash1, slash2 = "M/d/yyyy", "d/M/yyyy"
        dot1, dot2 = "M.d.yyyy", "d.M.yyyy"

    max_ts = F.lit(_MAX_TS).cast("timestamp")
    sentinels = ["10000-01-01 0:00:00"] if with_time else ["10000-01-01", "10000-01-01 0:00:00"]
    iso = "yyyy-MM-dd H:m:s" if with_time else "yyyy-MM-dd"

    return (
        F.when(t.contains("/"), F.coalesce(_try_ts(t, slash1 + suffix), _try_ts(t, slash2 + suffix)))
        .when(t.contains("."), F.coalesce(_try_ts(t, dot1 + suffix), _try_ts(t, dot2 + suffix)))
        .when(t.isin(*sentinels), max_ts)
        .when(t == "", F.lit(None).cast("timestamp"))
        .otherwise(_try_ts(t, iso))
    )


def _shitty_err(value_fn: Callable[[Column], Column]) -> Callable[[Column], Column]:
    # The reference raises ValueError when every format fails on a non-empty
    # string (strptime at formatting.py:327-338) and AttributeError on None
    # input (``date.strip()``, formatting.py:324) — both tolerated by the
    # import loop as keep-old-value. NULL input is therefore err, not a
    # legitimate NULL.
    def err(col: Column) -> Column:
        return col.isNull() | ((py_strip(col) != "") & value_fn(col).isNull())

    return err


def parse_shitty_date(shitty_format: str = "fr_FR") -> SparkParser:
    """Multi-format date -> timestamp (midnight), locale-ordered fallbacks.
    Default locale fr_FR (formatting.py:300)."""
    fn = lambda c: _shitty_date_value(c, shitty_format, with_time=False)  # noqa: E731
    return SparkParser(fn, _shitty_err(fn), name=f"parseShittyDate[{shitty_format}]")


def parse_shitty_date_as_date(shitty_format: str = "fr_FR") -> SparkParser:
    """parseShittyDate().date() -> DateType (formatting.py:341-357)."""
    fn = lambda c: _shitty_date_value(c, shitty_format, with_time=False).cast("date")  # noqa: E731
    return SparkParser(fn, _shitty_err(fn), name=f"parseShittyDateAsDate[{shitty_format}]")


def parse_shitty_datetime(shitty_format: str = "en_US") -> SparkParser:
    """Multi-format datetime; note the default locale is en_US, unlike the
    date variant's fr_FR (formatting.py:360 vs :300)."""
    fn = lambda c: _shitty_date_value(c, shitty_format, with_time=True)  # noqa: E731
    return SparkParser(fn, _shitty_err(fn), name=f"parseShittyDateTime[{shitty_format}]")


def _shitty_time_value(col: Column) -> Column:
    # %H:%M:%S -> timedelta (a duration, not a time-of-day) ->
    # DayTimeIntervalType (formatting.py:409-425).
    t = py_strip(col)
    ts = _try_ts(t, "H:m:s")
    return F.when(
        t != "",
        F.make_dt_interval(F.lit(0), F.hour(ts), F.minute(ts), F.second(ts).cast("double")),
    )


def _shitty_time_err(col: Column) -> Column:
    # None input -> AttributeError in the reference (formatting.py:422) ->
    # err, same as _shitty_err.
    t = py_strip(col)
    return col.isNull() | ((t != "") & _try_ts(t, "H:m:s").isNull())


parse_shitty_time = SparkParser(_shitty_time_value, _shitty_time_err, name="parseShittyTime")


# Convenience: python-side sentinel constants for tests / goldens.
PY_DATETIME_MAX = datetime.datetime.max
PY_DATE_MAX = datetime.date.max
