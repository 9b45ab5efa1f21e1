"""Expectations semantics on a hand-built frame (violations counted,
NULL pass-through, uniqueness, referential) and the one-job guarantee."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.expectations import (  # noqa: E402
    expect,
    in_range,
    matches,
    not_null,
    one_of,
)


def test_expectations_counts(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "O", "1-URGENT", 100),
            (2, -5.0, "X", "9-BOGUS", 999),   # range, enum, regex, fk violations
            (2, None, None, None, None),      # dup key; NULLs pass row checks
            (None, 0.0, "F", "5-LOW", 101),   # null key; 0.0 passes lo=0
        ],
        "k bigint, price double, status string, prio string, fk bigint",
    )
    dim = spark.createDataFrame([(100,), (101,)], "ck bigint")
    got = {
        r.check: r
        for r in expect(
            df,
            row_checks={
                "k_not_null": not_null("k"),
                "price_range": in_range("price", lo=0.0),
                "status_enum": one_of("status", ["O", "F", "P"]),
                "prio_format": matches("prio", "^[1-5]-"),
            },
            unique=["k"],
            references={"fk_in_dim": ("fk", dim, "ck")},
        ).collect()
    }
    assert all(r.n_rows == 4 for r in got.values())
    assert got["k_not_null"].violations == 1 and not got["k_not_null"].passed
    assert got["price_range"].violations == 1          # only -5.0; NULL and 0.0 pass
    assert got["status_enum"].violations == 1          # 'X'; NULL passes
    assert got["prio_format"].violations == 1          # '9-BOGUS'; NULL passes
    assert got["fk_in_dim"].violations == 1            # 999; NULL passes
    assert got["unique_k"].violations == 1             # one excess non-null dup
    assert len(got) == 6


def test_expectations_single_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    res = expect(df, row_checks={"ok": not_null("o_orderkey")}, unique=["o_custkey"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain(mode="formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert tree.count("Scan parquet") == 1
