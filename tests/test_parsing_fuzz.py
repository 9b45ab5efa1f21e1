"""Randomized differential fuzz for the §2.5 scalar parser library.

The reference's golden VALUES are ported in test_functions_golden.py;
this layer generates THOUSANDS of random inputs and checks the Spark
Column expressions against an independent Python transcription of the
reference's row-at-a-time semantics (int()/float()/strptime chains,
formatMontant normalization — formatting.py:134-425). Catches grammar
gaps the finite goldens can't (sign/zero-padding corners, ambiguous
day/month, NBSP placement, paren nesting, e-notation)."""

import datetime
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simpletasks_data_spark.functions import parsing as P  # noqa: E402

NBSP = " "


def _py_int_nullable(s):
    """formatting.py:240-244: int(s.strip()) -> ValueError swallows to None;
    None input raises (err)."""
    if s is None:
        return None, True
    try:
        return int(s.strip()), False
    except ValueError:
        return None, False


def _py_float_nullable(s):
    if s is None:
        return None, True
    try:
        return float(s.strip()), False
    except ValueError:
        return None, False


def _py_format_montant(s, loc):
    if s is None:
        return "0"
    v = s.strip(" \t\n\r\x0b\x0c" + NBSP)
    if v == "":
        return "0"
    if "(" in v:
        v = "-" + v.replace("(", "").replace(")", "")
    v = v.replace(",", "") if loc == "en_US" else v.replace(",", ".")
    v = v.replace(" ", "").replace(NBSP, "")
    if v in ("", "-"):
        return "0"
    return v


def _py_int_amount(s, loc):
    m = _py_format_montant(s, loc)
    try:
        return int(m)
    except ValueError:
        return 0


def _py_float_amount(s, loc):
    m = _py_format_montant(s, loc)
    try:
        return float(m)
    except ValueError:
        return 0.0


AMOUNT_PIECES = [
    "0", "1", "7", "42", "100", "999", "1234567", ",", ".", "(", ")", "-",
    "+", " ", NBSP, "e2", "x", "$", "..", "--", "1.5", "0,5",
]


def _rand_amount(rng):
    return "".join(rng.choice(AMOUNT_PIECES) for _ in range(rng.randrange(0, 6)))


def test_int_float_nullable_fuzz(spark):
    rng = random.Random(7)
    vals = [None, "", " ", "+0", "-0", "007", " 12 ", "1_000", " 42 "]
    vals += [_rand_amount(rng) for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s",
        P.str2intnullable.value("s").alias("iv"),
        P.str2intnullable.err("s").alias("ie"),
        P.str2floatnullable.value("s").alias("fv"),
        P.str2floatnullable.err("s").alias("fe"),
    ).collect()
    assert len(rows) == len(vals)
    for r in rows:
        wi, wie = _py_int_nullable(r["s"])
        wf, wfe = _py_float_nullable(r["s"])
        # python grammar extras the Column expressions deliberately do not
        # claim: underscored literals and inf/nan words never appear in the
        # reference's data; exclude them from the differential.
        s = (r["s"] or "").strip().lower()
        if "_" in s or "inf" in s or "nan" in s:
            continue
        assert (r["iv"], r["ie"]) == (wi, wie), r["s"]
        assert r["fe"] == wfe, r["s"]
        if wf is None:
            assert r["fv"] is None, r["s"]
        else:
            assert r["fv"] is not None and abs(r["fv"] - wf) < 1e-9, r["s"]


def test_amount_fuzz_both_locales(spark):
    rng = random.Random(13)
    vals = [None, "", "(5)", "( 5 )", "-", "()", "(,)", "1,000",
            "1,000.5", "1 000", f"1{NBSP}000", "(1,5)", "10.000,5"]
    vals += [_rand_amount(rng) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select(
        "s",
        P.format_montant("s", "en_US").alias("m_us"),
        P.format_montant("s", "fr_FR").alias("m_fr"),
        P.str2intamount("s", "en_US").alias("i_us"),
        P.str2intamount("s", "fr_FR").alias("i_fr"),
        P.str2floatamount("s", "en_US").alias("f_us"),
        P.str2floatamount("s", "fr_FR").alias("f_fr"),
    ).collect()
    for r in rows:
        s = r["s"]
        low = (r["m_us"] + r["m_fr"]).lower()
        if "e" in low or "inf" in low or "nan" in low or "_" in low:
            continue  # e-notation handled by both but float-text corners differ
        assert r["m_us"] == _py_format_montant(s, "en_US"), s
        assert r["m_fr"] == _py_format_montant(s, "fr_FR"), s
        assert r["i_us"] == _py_int_amount(s, "en_US"), s
        assert r["i_fr"] == _py_int_amount(s, "fr_FR"), s
        for got, want in ((r["f_us"], _py_float_amount(s, "en_US")),
                          (r["f_fr"], _py_float_amount(s, "fr_FR"))):
            assert abs(got - want) < 1e-9 or (got == 0.0 and want == 0.0), s


def _py_shitty_date(s, loc, with_time):
    """Transcription of formatting.py:300-338/360-406: strip; '/' formats
    first (locale order), then '.' formats, then the 10000-01-01 sentinel,
    then ISO; every failure on a non-empty string is err; None is err."""
    if s is None:
        return None, True
    t = s.strip(" \t\n\r\x0b\x0c" + NBSP)
    if t == "":
        return None, False
    day_first = loc == "fr_FR"
    suffix = " %H:%M:%S" if with_time else ""
    if "/" in t:
        fmts = ["%d/%m/%Y", "%m/%d/%Y"] if day_first else ["%m/%d/%Y", "%d/%m/%Y"]
    elif "." in t:
        fmts = ["%d.%m.%Y", "%m.%d.%Y"] if day_first else ["%m.%d.%Y", "%d.%m.%Y"]
    else:
        sentinels = (
            ["10000-01-01 0:00:00"]
            if with_time
            else ["10000-01-01", "10000-01-01 0:00:00"]
        )
        if t in sentinels:
            return datetime.datetime.max, False
        fmts = ["%Y-%m-%d"]
    for f in fmts:
        try:
            return datetime.datetime.strptime(t, f + suffix), False
        except ValueError:
            pass
    return None, True


def test_shitty_date_fuzz(spark):
    rng = random.Random(21)
    cases = [None, "", "10000-01-01", "10000-01-01 0:00:00", "2/30/2020",
             "30/2/2020", "31.4.2021", "4.31.2021", "29/2/2024", "29/2/2023",
             "not a date", "2021-13-01", "2021-02-29"]
    for _ in range(260):
        d = datetime.date(
            rng.randrange(1900, 2100), rng.randrange(1, 13), rng.randrange(1, 29)
        )
        style = rng.randrange(5)
        if style == 0:
            cases.append(f"{d.day}/{d.month}/{d.year}")
        elif style == 1:
            cases.append(f"{d.month:02d}/{d.day:02d}/{d.year}")
        elif style == 2:
            cases.append(f"{d.day}.{d.month}.{d.year}")
        elif style == 3:
            cases.append(d.isoformat())
        else:
            h, m, sec = rng.randrange(24), rng.randrange(60), rng.randrange(60)
            cases.append(f"{d.day}/{d.month}/{d.year} {h}:{m}:{sec}")
    df = spark.createDataFrame([(v,) for v in cases], "s string")
    for loc in ("fr_FR", "en_US"):
        for with_time, parser in (
            (False, P.parse_shitty_date(loc)),
            (True, P.parse_shitty_datetime(loc)),
        ):
            rows = df.select(
                "s", parser.value("s").alias("v"), parser.err("s").alias("e")
            ).collect()
            for r in rows:
                want_v, want_e = _py_shitty_date(r["s"], loc, with_time)
                assert r["e"] == want_e, (loc, with_time, r["s"])
                if want_v is None:
                    assert r["v"] is None, (loc, with_time, r["s"])
                elif want_v == datetime.datetime.max:
                    assert r["v"] == datetime.datetime(
                        9999, 12, 31, 23, 59, 59, 999999
                    ), (loc, with_time, r["s"])
                else:
                    assert r["v"] == want_v, (loc, with_time, r["s"])
