"""Golden tests for the scalar function library.

Ported 1:1 from the reference's ``tests/formatting_test.py`` (every
input/expected pair), evaluated through Spark Columns over a one-column
DataFrame — the parity floor for SURVEY §2.5.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from simpletasks_data_spark.functions import (
    create_str2strnullable,
    dump_datetime,
    dump_int,
    dump_percentage,
    dump_str,
    format_list,
    format_list_py,
    format_montant,
    parse_shitty_date,
    parse_shitty_date_as_date,
    parse_shitty_datetime,
    parse_shitty_time,
    str2bool,
    str2boolnullable,
    str2floatamount,
    str2floatnullable,
    str2intamount,
    str2intnullable,
    str2strnullable,
    to_list,
)

DT_MAX = datetime.datetime.max
DATE_MAX = datetime.date.max


def run1(spark, expr_fn, values):
    """Evaluate a Column recipe against a list of input strings; returns outputs."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select(expr_fn(F.col("v")).alias("out")).collect()
    return [r.out for r in rows]


def check(spark, expr_fn, cases):
    ins = [c[0] for c in cases]
    outs = run1(spark, expr_fn, ins)
    for (inp, expected), got in zip(cases, outs):
        assert got == expected, f"{inp!r}: expected {expected!r}, got {got!r}"


def test_str2bool(spark):
    check(spark, str2bool, [
        ("", False), (" ", False),
        ("YES", True), ("TRUE", True), ("NO", False), ("FALSE", False),
        ("t", True), ("1", True), ("oui", True), ("vrai", True),
    ])


def test_str2boolnullable(spark):
    check(spark, str2boolnullable.value, [
        ("", None), (" ", False),
        ("YES", True), ("TRUE", True), ("NO", False), ("FALSE", False),
    ])


def test_str2strnullable(spark):
    check(spark, lambda c: str2strnullable(c, None), [
        ("", None), (" ", None), ("foobar", "foobar"), ("  foobar  ", "foobar"),
    ])
    check(spark, lambda c: str2strnullable(c, 2), [
        ("foobar", "fo"), ("  foobar  ", "fo"),
    ])
    p = create_str2strnullable(2)
    check(spark, p.value, [("", None), (" ", None), ("foobar", "fo"), ("  foobar  ", "fo")])


def test_str2intnullable(spark):
    check(spark, str2intnullable.value, [
        ("", None), ("42", 42), ("42.56", None), ("foobar", None),
        ("  7  ", 7), ("+3", 3), ("-12", -12),
    ])


def test_str2floatnullable(spark):
    check(spark, str2floatnullable.value, [
        ("", None), ("42", 42.0), ("42.56", 42.56), ("foobar", None),
    ])


def test_formatMontant(spark):
    check(spark, format_montant, [
        (None, "0"), ("", "0"), ("-", "0"),
        ("(1,000.0)", "-1000.0"), ("-1,000.0", "-1000.0"), (" ", "0"),
    ])
    check(spark, lambda c: format_montant(c, "fr_FR"), [
        ("-1 000,0", "-1000.0"),
        ("-1 000,0", "-1000.0"),
    ])


def test_str2intamount(spark):
    check(spark, str2intamount, [
        ("", 0), ("42", 42), ("-1,000", -1000), ("-1,000.0", 0),
    ])


def test_str2floatamount(spark):
    check(spark, str2floatamount, [
        ("", 0.0), ("42", 42.0), ("-1,000", -1000.0), ("-1,000.0", -1000.0),
    ])


def test_parseShittyDate(spark):
    dt = datetime.datetime(2020, 1, 2)
    dt2 = datetime.datetime(2020, 1, 24)
    fr = parse_shitty_date("fr_FR")
    en = parse_shitty_date("en_US")
    check(spark, fr.value, [
        ("", None),
        ("02/01/2020", dt), ("02.01.2020", dt), ("2020-01-02", dt),
        ("01/24/2020", dt2), ("01.24.2020", dt2), ("2020-01-24", dt2),
        ("10000-01-01", DT_MAX), ("10000-01-01 0:00:00", DT_MAX),
    ])
    check(spark, en.value, [
        ("01/02/2020", dt), ("01.02.2020", dt),
        ("24/01/2020", dt2), ("24.01.2020", dt2),
    ])


def test_parseShittyDateAsDate(spark):
    d = datetime.date(2020, 1, 2)
    d2 = datetime.date(2020, 1, 24)
    fr = parse_shitty_date_as_date("fr_FR")
    en = parse_shitty_date_as_date("en_US")
    check(spark, fr.value, [
        ("", None),
        ("02/01/2020", d), ("02.01.2020", d), ("2020-01-02", d),
        ("01/24/2020", d2), ("01.24.2020", d2), ("2020-01-24", d2),
        ("10000-01-01", DATE_MAX), ("10000-01-01 0:00:00", DATE_MAX),
    ])
    check(spark, en.value, [
        ("01/02/2020", d), ("01.02.2020", d),
        ("24/01/2020", d2), ("24.01.2020", d2),
    ])


def test_parseShittyDate_err(spark):
    fr = parse_shitty_date("fr_FR")
    check(spark, fr.err, [
        ("", False), ("02/01/2020", False), ("garbage", True), ("99/99/2020", True),
    ])


def test_parseShittyDateTime(spark):
    dt = datetime.datetime(2020, 1, 2, 3, 4, 5)
    dt2 = datetime.datetime(2020, 1, 24, 3, 4, 5)
    en = parse_shitty_datetime("en_US")  # reference default locale
    fr = parse_shitty_datetime("fr_FR")
    check(spark, fr.value, [
        ("02/01/2020 03:04:05", dt), ("02.01.2020 03:04:05", dt),
        ("01/24/2020 03:04:05", dt2), ("01.24.2020 03:04:05", dt2),
        ("2020-01-02 03:04:05", dt), ("2020-01-24 03:04:05", dt2),
    ])
    check(spark, en.value, [
        ("", None),
        ("01/02/2020 03:04:05", dt), ("01.02.2020 03:04:05", dt),
        ("24/01/2020 03:04:05", dt2), ("24.01.2020 03:04:05", dt2),
        ("10000-01-01 0:00:00", DT_MAX),
    ])


def test_parseShittyTime(spark):
    td = datetime.timedelta(hours=1, minutes=2, seconds=3)
    check(spark, parse_shitty_time.value, [
        ("", None), ("01:02:03", td),
    ])
    check(spark, parse_shitty_time.err, [
        ("", False), ("01:02:03", False), ("nope", True),
    ])


def test_dump_datetime(spark):
    d = datetime.datetime(2020, 1, 2)
    dt = datetime.datetime(2020, 1, 2, 3, 4, 5)
    df = spark.createDataFrame([(None,), (d,), (dt,)], "v timestamp")

    def col_for(fmt):
        return [r.o for r in df.select(dump_datetime(F.col("v"), fmt).alias("o")).collect()]

    assert col_for("json") == [None, "2020-01-02T00:00:00", "2020-01-02T03:04:05"]
    assert col_for("gs") == [None, "2020-01-02 00:00:00", "2020-01-02 03:04:05"]
    assert col_for("%d/%m/%Y") == [None, "02/01/2020", "02/01/2020"]


def test_dump_int(spark):
    df = spark.createDataFrame([(None,), (0.0,), (42.0,), (0.45,)], "v double")
    out = [r.o for r in df.select(dump_int(F.col("v")).alias("o")).collect()]
    assert out == ["0", "0", "42", "0"]


def test_dump_percentage(spark):
    df = spark.createDataFrame([(None,), (0.0,), (1.0,), (0.456,), (0.45678,)], "v double")
    out = [r.o for r in df.select(dump_percentage(F.col("v")).alias("o")).collect()]
    assert out == ["0.0", "0.0", "100.0", "45.6", "45.7"]


def test_dump_str(spark):
    check(spark, dump_str, [
        (None, "-"), ("", "-"), ("    ", "-"), ("1", "1"),
    ])


FORMAT_LIST_GOLDENS = [
    (None, []),
    ("", []),
    ("val1", ["val1"]),
    ('"val1"', ["val1"]),
    ("'val1'", ["val1"]),
    ("val1; val2 et val3", ["val1", "val2", "val3"]),
    ("val1, val2 et val3", ["val1", "val2", "val3"]),
    ("val1, val2; val3 et val4", ["val1", "val2", "val3", "val4"]),
    (" val1 , val2 et val3 ", ["val1", "val2", "val3"]),
    (" ,val1 , val2 et val3, ", ["val1", "val2", "val3"]),
    ("val1 (1,2,3), val2 et val3", ["val1 (1,2,3)", "val2", "val3"]),
    ('val1 (1,2,3), "val2 et val3"', ["val1 (1,2,3)", "val2, val3"]),
    ("caractères, accentués", ["caractères", "accentués"]),
]


def test_format_list_py():
    for inp, expected in FORMAT_LIST_GOLDENS:
        assert format_list_py(inp) == expected, repr(inp)


def test_format_list_spark(spark):
    check(spark, format_list, FORMAT_LIST_GOLDENS)


def test_to_list(spark):
    df = spark.createDataFrame([([None, "a", "", "b"],), ([],)], "v array<string>")
    out = [r.o for r in df.select(to_list(F.col("v")).alias("o")).collect()]
    assert out == [["a", "b"], []]


def test_helpers():
    from simpletasks_data_spark.helpers import cell2coords, col2num, num2col, range2tab

    assert col2num("A") == 0
    assert col2num("Z") == 25
    assert col2num("AA") == 26
    assert num2col(1) == "A"
    assert num2col(26) == "Z"
    assert num2col(27) == "AA"

    assert cell2coords("A1") == (0, 0)
    assert cell2coords("AA5") == (26, 4)
    assert cell2coords("Z26") == (25, 25)
    assert cell2coords("A") == (0, None)
    assert cell2coords("AA") == (26, None)
    assert cell2coords("1") == (None, 0)
    with pytest.raises(ValueError) as e:
        cell2coords("1A")
    assert str(e.value) == "Could not parse range 1A"

    assert range2tab("A1:A") == (0, 0, 0, None)
    assert range2tab("A1:A5") == (0, 0, 0, 4)
    assert range2tab("A1:B") == (0, 0, 1, None)
    assert range2tab("A1:B5") == (0, 0, 1, 4)
    assert range2tab("A1:*") == (0, 0, None, None)
    for bad in ["*:A", "AB", "A:B:C", "A:*", "1:*"]:
        with pytest.raises(ValueError):
            range2tab(bad)


def test_format_list_udf_matches_python_hypothesis(spark):
    """Property test: the Arrow-vectorized formatList UDF agrees with the
    pure-Python reference splitter on arbitrary strings (quotes, parens,
    separators, unicode) — pins the pandas_udf plumbing, not just the
    golden cases."""
    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.functions.lists import format_list, format_list_py

    alphabet = st.sampled_from(list("ab c,;()'\"x9-é et and"))
    texts = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=40), min_size=1, max_size=24
    )

    @settings(max_examples=10, deadline=None)
    @given(texts)
    def check(batch):
        df = spark.createDataFrame([(i, s) for i, s in enumerate(batch)], "i long, s string")
        got = {
            r["i"]: list(r["out"])
            for r in df.select("i", format_list("s").alias("out")).collect()
        }
        want = {i: format_list_py(s) for i, s in enumerate(batch)}
        assert got == want

    check()
