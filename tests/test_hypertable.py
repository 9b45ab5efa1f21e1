"""hypertable_rollup: each emitted grain must equal a direct GROUP BY of
the raw rows at that grain (sum/count are decomposable, grids nest)."""

import datetime as dt
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.functions.timeseries import time_bucket, width_seconds  # noqa: E402
from simpletasks_data_spark.operators.hypertable import hypertable_rollup  # noqa: E402


def _events(spark):
    base = dt.datetime(2024, 3, 1)
    rows = [
        (base + dt.timedelta(minutes=7 * i), "a" if i % 3 else "b", float(i))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "ts timestamp, k string, v double")


def test_each_grain_matches_direct_groupby(spark):
    ev = _events(spark)
    out = hypertable_rollup(
        ev, ts_col="ts", keys=["k"], grains=["15 minutes", "1 hour", "1 day"],
        partial={"n": F.count(F.lit(1)), "total": F.sum("v")},
        merge={"n": F.sum("n"), "total": F.sum("total")},
    ).collect()
    got = {(r["grain"], r["bucket_ts"], r["k"]): (r["n"], r["total"]) for r in out}
    for g in ["15 minutes", "1 hour", "1 day"]:
        direct = (
            ev.groupBy(time_bucket(g, F.col("ts")).alias("b"), "k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
            .collect()
        )
        for r in direct:
            n, total = got[(g, r["b"], r["k"])]
            assert n == r["n"]
            assert total == pytest.approx(r["total"], rel=1e-12)


def test_grain_validation():
    assert width_seconds("15 minutes") == 900
    with pytest.raises(ValueError):
        width_seconds("-1 hours")
    spark_less_args = dict(
        ts_col="ts", keys=[], partial={}, merge={},
    )
    with pytest.raises(ValueError):
        hypertable_rollup(None, grains=["1 hour", "90 minutes"], **spark_less_args)
    with pytest.raises(ValueError):
        hypertable_rollup(None, grains=["7 minutes", "1 hour"], **spark_less_args)


def test_hypertable_rollup_matches_pandas_hypothesis(spark):
    """Randomized multi-grain rollup vs direct pandas epoch-floor
    groupbys: count and sum per (grain, bucket, key) across a 1h->6h->1d
    nesting chain — sparse buckets, events exactly on bucket boundaries,
    keys absent from some buckets."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F

    from simpletasks_data_spark.operators.hypertable import hypertable_rollup

    base = dt.datetime(2024, 1, 1)
    rows_strat = st.lists(
        st.tuples(
            st.integers(1, 2),             # key
            st.integers(0, 3 * 24 * 60),   # minutes over 3 days
            st.integers(-10, 10),          # value
        ),
        min_size=1,
        max_size=25,
    )

    @given(rows_strat)
    @settings(max_examples=8, deadline=None)
    def check(rows):
        df = spark.createDataFrame(
            [(k, base + dt.timedelta(minutes=m), v) for k, m, v in rows],
            "k long, ts timestamp, v long",
        )
        out = hypertable_rollup(
            df,
            "ts",
            keys=["k"],
            grains=["1 hour", "6 hours", "1 day"],
            partial={"n": F.count(F.lit(1)), "s": F.sum("v")},
            merge={"n": F.sum("n"), "s": F.sum("s")},
        ).collect()
        got = {
            (r["grain"], r["bucket_ts"], r["k"]): (r["n"], r["s"]) for r in out
        }

        want = {}
        for g, secs in (("1 hour", 3600), ("6 hours", 21600), ("1 day", 86400)):
            for k, m, v in rows:
                ts = base + dt.timedelta(minutes=m)
                epoch = int(ts.replace(tzinfo=dt.timezone.utc).timestamp())
                bts = dt.datetime.utcfromtimestamp(epoch // secs * secs)
                kk = (g, bts, k)
                n, s = want.get(kk, (0, 0))
                want[kk] = (n + 1, s + v)
        assert got == want

    check()
