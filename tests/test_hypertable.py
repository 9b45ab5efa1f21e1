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
