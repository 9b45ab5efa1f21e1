"""Profiler semantics on a hand-built frame (nulls, distincts, mixed types)
and the one-pass/no-Expand plan guarantees."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.profile import profile  # noqa: E402


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_profile_stats(spark):
    df = spark.createDataFrame(
        [(1, "aa", 1.5), (2, "bbbb", None), (3, None, 2.5), (3, "aa", 2.5)],
        "k int, s string, v double",
    )
    got = {r.col_name: r for r in profile(df).collect()}
    assert got["k"].n_rows == 4 and got["k"].null_count == 0
    assert got["k"].distinct_count == 3
    assert (got["k"].min_num, got["k"].max_num) == (1.0, 3.0)
    assert got["k"].min_str is None and got["k"].avg_len is None
    assert got["s"].null_count == 1 and got["s"].distinct_count == 2
    assert (got["s"].min_str, got["s"].max_str) == ("aa", "bbbb")
    assert got["s"].avg_len == 2.6667  # (2+4+2)/3 over non-null
    assert got["v"].null_count == 1 and (got["v"].min_num, got["v"].max_num) == (1.5, 2.5)


def test_profile_one_scan_and_approx_no_expand(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    exact = _plan(profile(df)).split("\n\n")[0]  # plan tree only
    assert exact.count("Scan parquet") == 1  # one pass, however many columns
    assert "Expand" in exact  # multiple exact distincts cost an Expand...
    approx = _plan(profile(df, approx=True)).split("\n\n")[0]
    assert approx.count("Scan parquet") == 1
    assert "Expand" not in approx  # ...the HLL path must not


def test_exact_group_median_crafted(spark):
    """Odd/even group sizes, duplicate values, and values straddling a
    bucket boundary must all yield the exact lower median."""
    from simpletasks_data_spark.operators.profile import exact_group_median

    rows = (
        [("a", v) for v in [5, 1, 9, 7, 3]]            # odd: median 5
        + [("b", v) for v in [10, 20, 30, 40]]          # even: lower = 20
        + [("c", v) for v in [2, 2, 2, 99999, 100001]]  # dupes + boundary
    )
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: (r["n"], r["median"])
        for r in exact_group_median(df, ["g"], "v", bucket_width=100000).collect()
    }
    assert got == {"a": (5, 5), "b": (4, 20), "c": (5, 2)}

    # tiny bucket width forces real two-level refinement
    got2 = {
        r["g"]: r["median"]
        for r in exact_group_median(df, ["g"], "v", bucket_width=3).collect()
    }
    assert got2 == {"a": 5, "b": 20, "c": 2}
