"""bloom_semi_join must equal the plain semi join exactly, with the
probe side filtered by broadcast joins only (no probe-side shuffle
before the verify join)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.bloom import bloom_semi_join  # noqa: E402


def _frames(spark):
    large = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    small = spark.range(300).select((F.col("id") * 31).alias("sk"))
    return large, small


def test_bloom_equals_plain_semi(spark):
    large, small = _frames(spark)
    got = {
        r["k"]
        for r in bloom_semi_join(large, small, "k", "sk", m_bits=1 << 12).collect()
    }
    want = {
        r["k"]
        for r in large.join(
            small.withColumnRenamed("sk", "k"), ["k"], "semi"
        ).collect()
    }
    assert got == want and len(want) > 0


def test_bloom_small_m_still_exact(spark):
    """With a tiny bit space (many false positives) the verify join must
    still make the result exact."""
    large, small = _frames(spark)
    got = {r["k"] for r in bloom_semi_join(large, small, "k", "sk", m_bits=64, k=2).collect()}
    want = {r["k"] for r in large.join(small.withColumnRenamed("sk", "k"), ["k"], "semi").collect()}
    assert got == want


def test_bloom_plan_broadcast_probes(spark):
    large, small = _frames(spark)
    plan = (
        bloom_semi_join(large, small, "k", "sk")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
