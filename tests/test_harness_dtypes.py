"""Regression gate for the harness itself: an oracle whose column pandas
fetches as float64 against a Spark long column must FAIL local parity
(driver stringifies cells, so ``78.0`` != ``78`` on every row — the exact
class that produced r4's only driver red, masked by %.6g locally)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_harness import compare, dtype_kind_mismatches  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


def _long_query(spark, sf_dir):
    from pyspark.sql import functions as F
    df = spark.read.parquet(f"{sf_dir}/region.parquet")
    return df.groupBy().agg(F.count("*").alias("n"))


def test_float64_oracle_for_long_column_fails(spark):
    # sum(BIGINT) promotes to HUGEINT in DuckDB -> pandas float64.
    sql = "SELECT sum(n) AS n FROM (SELECT count(*) AS n FROM region)"
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare(spark, "hugeint_regression", _long_query, sql, SF_DIR)


def test_double_oracle_for_long_column_fails(spark):
    sql = "SELECT CAST(count(*) AS DOUBLE) AS n FROM region"
    with pytest.raises(AssertionError, match="dtype-kind"):
        compare(spark, "double_vs_long_regression", _long_query, sql, SF_DIR)


def test_bigint_cast_oracle_passes(spark):
    sql = ("SELECT CAST(sum(n) AS BIGINT) AS n "
           "FROM (SELECT count(*) AS n FROM region)")
    assert compare(spark, "bigint_cast_ok", _long_query, sql, SF_DIR) == 1


def test_kind_map_units():
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("d", T.DateType()),
    ])
    # date-vs-timestamp collapses to one temporal kind (r3 DATE precedent)
    assert dtype_kind_mismatches(schema, ["n", "x", "d"],
                                 ["BIGINT", "DOUBLE", "TIMESTAMP"]) == []
    assert dtype_kind_mismatches(schema, ["n"], ["HUGEINT"]) == [
        "n: spark=int oracle=hugeint"
    ]
    assert dtype_kind_mismatches(schema, ["x"], ["BIGINT"]) == [
        "x: spark=float oracle=int"
    ]
