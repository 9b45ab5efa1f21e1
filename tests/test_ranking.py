"""operators/ranking: the distributed exact-rank / exact-ntile pattern
must be bit-identical to the window functions it replaces."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from simpletasks_data_spark.operators.ranking import (  # noqa: E402
    exact_ntile,
    global_row_number,
)


def _frame(spark, n, seed):
    # deterministic pseudo-random values with ties, unique tie-break id
    return spark.range(n).select(
        F.col("id"),
        (F.hash(F.col("id") + seed) % 7).alias("v"),
    ).repartition(8)


def test_global_row_number_matches_window(spark):
    df = _frame(spark, 500, 11)
    got, total = global_row_number(df, ["v", "id"], "pos", partitions=8)
    assert total == 500
    w = Window.orderBy("v", "id")
    want = df.withColumn("pos", F.row_number().over(w).cast("long"))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


@pytest.mark.parametrize("n,buckets", [(500, 10), (503, 7), (5, 10), (64, 5)])
def test_exact_ntile_matches_window_ntile(spark, n, buckets):
    df = _frame(spark, n, n + buckets)
    got = exact_ntile(df, buckets, ["v", "id"], out_col="b", partitions=8)
    w = Window.orderBy("v", "id")
    want = df.withColumn("b", F.ntile(buckets).over(w).cast("long"))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_exact_ntile_desc_ordering(spark):
    df = _frame(spark, 200, 3)
    got = exact_ntile(df, 5, [F.desc("v"), F.asc("id")], out_col="b", partitions=8)
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("b", F.ntile(5).over(w).cast("long"))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_empty_frame(spark):
    df = _frame(spark, 100, 1).where("v > 100")
    got, total = global_row_number(df, ["v", "id"], "pos")
    assert total == 0 and got.count() == 0
    assert exact_ntile(df, 4, ["v", "id"]).count() == 0


def test_nearest_in_1d_exact(spark):
    """Nearest candidate with caliper, min-key collapse at equal values,
    lower-side tie break — and boundary carry across range partitions
    (forced with partitions=4 over interleaved values)."""
    from simpletasks_data_spark.operators.ranking import nearest_in_1d

    pts = spark.createDataFrame(
        [(1, 10), (2, 25), (3, 100), (4, 55)], "key long, v long"
    )
    cands = spark.createDataFrame(
        [(101, 12), (102, 20), (103, 30), (104, 30), (105, 50)],
        "key long, v long",
    )
    got = {
        r["key"]: (r["match_key"], r["match_v"], r["gap"])
        for r in nearest_in_1d(pts, cands, max_gap=50, partitions=4).collect()
    }
    assert got[1] == (101, 12, 2)
    # 25 is equidistant from 20 and 30 -> lower side (20) wins
    assert got[2] == (102, 20, 5)
    # equal-value candidates collapse to min key (103, not 104)
    assert got[4] == (105, 50, 5)
    assert got[3] == (105, 50, 50)  # carry across partitions, at caliper

    got2 = {
        r["key"]: r["match_key"]
        for r in nearest_in_1d(
            pts.where("key = 3"), cands.where("v = 30"), partitions=4
        ).collect()
    }
    assert got2[3] == 103  # min-key representative at the tied value
