"""Randomized differential fuzz for the §2.2 export formatters vs the
reference's python semantics (formatting.py:14-93): f-string/%-format
rendering, half-to-even rounding, python str.strip() whitespace set."""

import datetime
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simpletasks_data_spark.functions import dumping as D  # noqa: E402


def test_dump_int_and_percentage_fuzz(spark):
    rng = random.Random(5)
    vals = [None, 0.0, -0.0, 0.5, 1.5, 2.5, -0.5, -1.5, 0.25, -0.3, 1e15]
    vals += [rng.uniform(-1e6, 1e6) for _ in range(200)]
    # dyadic rationals land EXACTLY on .5 ties — the half-even contract
    vals += [rng.randrange(-1000, 1000) + 0.5 for _ in range(50)]
    vals += [(rng.randrange(-10000, 10000) + 0.5) / 1000 for _ in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = df.select(
        "v", D.dump_int("v").alias("i"), D.dump_percentage("v").alias("p")
    ).collect()
    for r in rows:
        v = r["v"]
        want_i = "0" if v is None else "{:.0f}".format(v)
        want_p = "0.0" if v is None else "{:.1f}".format(v * 100)
        assert r["i"] == want_i, v
        assert r["p"] == want_p, v


def test_dump_nan_inf_render_python_style(spark):
    """NaN/Inf inputs render python-style ('nan'/'inf'), matching the
    reference's '{:.Nf}'.format — NOT NULL (r8 ADVICE: the pandas_udf
    used to fold NaN into NULL) and NOT java's 'NaN'. NULL stays NULL
    through dump_gps and coalesces to '0'/'0.0' in dump_int/percentage."""
    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [(nan, nan), (inf, -inf), (None, nan), (1.5, None)],
        "lat double, lon double",
    )
    rows = df.select(
        D.dump_gps("lat", "lon").alias("g"),
        D.dump_int("lat").alias("i"),
        D.dump_percentage("lat").alias("p"),
    ).collect()
    assert rows[0]["g"] == "nan, nan"
    assert rows[0]["i"] == "{:.0f}".format(nan) == "nan"
    assert rows[0]["p"] == "{:.1f}".format(nan * 100) == "nan"
    assert rows[1]["g"] == "inf, -inf"
    assert rows[1]["i"] == "inf"
    assert rows[2]["g"] is None and rows[2]["i"] == "0" and rows[2]["p"] == "0.0"
    assert rows[3]["g"] is None


def test_dump_gps_fuzz(spark):
    rng = random.Random(6)
    pairs = [(None, 1.0), (1.0, None), (None, None), (48.85, 2.35)]
    pairs += [
        (rng.uniform(-90, 90), rng.uniform(-180, 180)) for _ in range(150)
    ]
    # near-tie dyadics (terminate past 6 decimals, never exactly ON a tie)
    pairs += [
        (rng.randrange(-2**20, 2**20) / 2**13, rng.randrange(-2**20, 2**20) / 2**13)
        for _ in range(100)
    ]
    # odd/128 terminates at EXACTLY 7 decimals ending in 5: a binary-exact
    # tie at the 6th place — python %f half-evens, java %f HALF_UPs
    pairs += [
        ((2 * rng.randrange(-500, 500) + 1) / 128, (2 * rng.randrange(-500, 500) + 1) / 128)
        for _ in range(60)
    ]
    df = spark.createDataFrame(pairs, "lat double, lon double")
    rows = df.select("lat", "lon", D.dump_gps("lat", "lon").alias("g")).collect()
    for r in rows:
        if r["lat"] is None or r["lon"] is None:
            assert r["g"] is None
        else:
            assert r["g"] == "%f, %f" % (r["lat"], r["lon"]), (r["lat"], r["lon"])


def test_dump_datetime_fuzz(spark):
    rng = random.Random(8)
    dts = [None] + [
        datetime.datetime(
            rng.randrange(1970, 2100), rng.randrange(1, 13), rng.randrange(1, 29),
            rng.randrange(24), rng.randrange(60), rng.randrange(60),
        )
        for _ in range(120)
    ]
    df = spark.createDataFrame([(d,) for d in dts], "ts timestamp")
    fmts = {
        "json": "%Y-%m-%dT%H:%M:%S",
        "gs": "%Y-%m-%d %H:%M:%S",
        "%d/%m/%Y %H:%M": "%d/%m/%Y %H:%M",
        "%y-%j": "%y-%j",
    }
    sel = [
        D.dump_datetime("ts", f).alias(f"o{i}") for i, f in enumerate(fmts)
    ]
    rows = df.select("ts", *sel).collect()
    for r in rows:
        for i, (_, pyfmt) in enumerate(fmts.items()):
            want = None if r["ts"] is None else r["ts"].strftime(pyfmt)
            assert r[f"o{i}"] == want, (r["ts"], pyfmt)


def test_dump_str_fuzz(spark):
    rng = random.Random(9)
    WS = " \t\n\r  　"  # incl. NBSP, em space, ideographic space
    alphabet = list("ab∆9" + WS)
    vals = [None, "", " ", " ", " 　", "\t\n", "a ", " a"]
    vals += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 6)))
             for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", D.dump_str("s").alias("d")).collect()
    for r in rows:
        s = r["s"]
        want = "-" if s is None or s.strip() == "" else s
        assert r["d"] == want, repr(s)
