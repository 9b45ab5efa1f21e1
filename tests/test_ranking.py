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
    global_prefix_sum,
    global_row_number,
    nearest_in_1d,
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


def test_global_prefix_sum_matches_window(spark):
    df = _frame(spark, 500, 7).select(
        "id", "v", (F.col("id") % 13).alias("n"), (F.col("v") / 3.0).alias("x")
    )
    got = global_prefix_sum(
        df, ["v", "id"], {"n": "cum_n", "x": "cum_x"}, partitions=8
    )
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "*", F.sum("n").over(w).alias("cum_n"), F.sum("x").over(w).alias("cum_x")
    )
    gl = {r["id"]: (r["cum_n"], r["cum_x"]) for r in got.collect()}
    for r in want.collect():
        assert gl[r["id"]][0] == r["cum_n"]
        assert abs(gl[r["id"]][1] - r["cum_x"]) < 1e-9


def test_global_prefix_sum_partitioned(spark):
    df = _frame(spark, 400, 3).select(
        "id", "v", (F.col("id") % 5).alias("fold"), (F.col("id") % 11).alias("n")
    )
    got = global_prefix_sum(
        df, ["v", "id"], {"n": "cum_n"}, partition_by=["fold"], partitions=8
    )
    w = (
        Window.partitionBy("fold")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.select("*", F.sum("n").over(w).alias("cum_n"))
    gl = {r["id"]: r["cum_n"] for r in got.collect()}
    for r in want.collect():
        assert gl[r["id"]] == r["cum_n"]


def test_global_prefix_sum_empty(spark):
    df = _frame(spark, 50, 1).where("v > 100").select("id", "v", F.lit(1).alias("n"))
    got = global_prefix_sum(df, ["v", "id"], {"n": "cum_n"})
    assert got.count() == 0 and "cum_n" in got.columns


def test_nearest_in_1d_exact(spark):
    """Nearest candidate with caliper, min-key collapse at equal values,
    lower-side tie break — and boundary carry across range partitions
    (forced with partitions=4 over interleaved values)."""

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


def _brute_nearest(pts, cands):
    """Driver-side oracle mirroring nearest_in_1d's tie contract:
    candidates collapse to min-key per value; equidistant -> lower value."""
    reps = {}
    for k, v in cands:
        if v not in reps or k < reps[v]:
            reps[v] = k
    out = {}
    for k, v in pts:
        best = None
        for cv, ck in reps.items():
            cand = (abs(v - cv), 0 if cv <= v else 1, ck, cv)
            if best is None or cand < best:
                best = cand
        if best is not None:
            out[k] = (best[2], best[3], best[0])
    return out


def test_nearest_in_1d_all_equal_values(spark):
    """The propensity lesson: concentrated distributions must NOT
    degenerate. Every candidate shares one value; result is exact and the
    plan stays a range exchange (no single-partition stage)."""
    pts = spark.createDataFrame([(i, 42) for i in range(200)], "key long, v long")
    cands = spark.createDataFrame(
        [(1000 + i, 42) for i in range(300)], "key long, v long"
    )
    res = nearest_in_1d(pts, cands, partitions=8)
    rows = res.collect()
    assert len(rows) == 200
    assert all(r["match_key"] == 1000 and r["gap"] == 0 for r in rows)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_nearest_in_1d_mega_duplicate_plus_tail(spark):
    pts_l = [(i, 500) for i in range(150)] + [(200 + i, i * 7) for i in range(50)]
    cands_l = [(1000 + i, 500) for i in range(100)] + [
        (2000 + i, i * 13) for i in range(40)
    ]
    pts = spark.createDataFrame(pts_l, "key long, v long")
    cands = spark.createDataFrame(cands_l, "key long, v long")
    want = _brute_nearest(pts_l, cands_l)
    got = {
        r["key"]: (r["match_key"], r["match_v"], r["gap"])
        for r in nearest_in_1d(pts, cands, partitions=8).collect()
    }
    assert got == want


def test_nearest_in_1d_empty_candidates(spark):
    pts = spark.createDataFrame([(1, 10), (2, 20)], "key long, v long")
    cands = spark.createDataFrame([], "key long, v long")
    assert nearest_in_1d(pts, cands, partitions=4).count() == 0


def test_nearest_in_1d_non_long_dtypes(spark):
    """ADVICE r5: the carry struct must type from the input schema —
    int value axis + string keys used to mis-type the coalesce."""
    pts = spark.createDataFrame(
        [("p1", 10), ("p2", 95)], "key string, v int"
    )
    cands = spark.createDataFrame(
        [("c1", 12), ("c2", 90)], "key string, v int"
    )
    got = {
        r["key"]: (r["match_key"], r["gap"])
        for r in nearest_in_1d(pts, cands, partitions=4).collect()
    }
    assert got == {"p1": ("c1", 2), "p2": ("c2", 5)}


def test_exact_ntile_all_equal_values(spark):
    """Concentrated distribution through the ntile kernel: ties broken by
    the unique id keep buckets exact vs the window function."""
    df = spark.range(100).select("id", F.lit(7).alias("v")).repartition(8)
    got = exact_ntile(df, 4, ["v", "id"], out_col="b", partitions=8)
    w = Window.orderBy("v", "id")
    want = df.withColumn("b", F.ntile(4).over(w).cast("long"))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_global_running_min_matches_window(spark):
    from simpletasks_data_spark.operators.ranking import global_running_min

    df = _frame(spark, 300, 9).select(
        "id", "v", (F.hash(F.col("id") * 3) % 100).alias("d")
    )
    for inclusive, hi in ((False, -1), (True, 0)):
        got = global_running_min(
            df, ["v", "id"], {"d": "m"}, inclusive=inclusive, partitions=8
        )
        w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, hi)
        want = df.select("*", F.min("d").over(w).alias("m"))
        gl = {r["id"]: r["m"] for r in got.collect()}
        for r in want.collect():
            assert gl[r["id"]] == r["m"], (inclusive, r)


def test_global_running_max_matches_window(spark):
    from simpletasks_data_spark.operators.ranking import global_running_max

    df = _frame(spark, 400, 23).withColumn("e", F.col("v") * 3 + F.col("id") % 5)
    got = global_running_max(df, ["v", "id"], {"e": "pm"}, partitions=8)
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("pm", F.max("e").over(w))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_global_running_max_inclusive(spark):
    from simpletasks_data_spark.operators.ranking import global_running_max

    df = _frame(spark, 150, 9).withColumn("e", F.col("id") % 11)
    got = global_running_max(df, ["v", "id"], {"e": "pm"}, inclusive=True, partitions=8)
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("pm", F.max("e").over(w))
    assert got.orderBy("id").collect() == want.orderBy("id").collect()


def test_global_prefix_sum_all_equal_primary_keys(spark):
    """Adversarial shape (r6 verdict item 8): the primary order column is
    one giant tie, so the range exchange has a single key value and every
    row's position is decided by the tiebreaker alone. The kernel must
    still match the single-task window exactly."""
    df = _frame(spark, 300, 4).select(
        "id", F.lit(7).alias("v"), (F.col("id") % 9).alias("n")
    )
    got = global_prefix_sum(df, ["v", "id"], {"n": "cum_n"}, partitions=8)
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select("*", F.sum("n").over(w).alias("cum_n"))
    gl = {r["id"]: r["cum_n"] for r in got.collect()}
    for r in want.collect():
        assert gl[r["id"]] == r["cum_n"]


def test_global_row_number_single_mega_group_partitioned(spark):
    """Adversarial shape: partitioned prefix sums where ONE partition_by
    group holds ~95% of the rows (the skewed-fold case that motivated
    kfold's union-ranking). The mega group must rank exactly like the
    window, not just the balanced groups."""
    df = _frame(spark, 400, 2).select(
        "id",
        "v",
        F.when(F.col("id") % 20 == 0, F.lit(1)).otherwise(F.lit(0)).alias("fold"),
        F.lit(1).alias("n"),
    )
    got = global_prefix_sum(
        df, ["v", "id"], {"n": "cum_n"}, partition_by=["fold"], partitions=8
    )
    w = (
        Window.partitionBy("fold")
        .orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.select("*", F.sum("n").over(w).alias("cum_n"))
    gl = {r["id"]: r["cum_n"] for r in got.collect()}
    for r in want.collect():
        assert gl[r["id"]] == r["cum_n"]


def test_exact_ntile_matches_sql_definition_hypothesis(spark):
    """Randomized check of exact_ntile against the SQL ntile definition
    computed directly in Python (first N%n buckets get one extra row
    under the (value, id) tie-broken total order) — heavy ties, single
    rows, more buckets than rows."""
    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.operators.ranking import exact_ntile

    rows_strat = st.lists(st.integers(0, 5), min_size=1, max_size=40)
    n_strat = st.sampled_from([1, 2, 3, 7])

    @given(rows_strat, n_strat)
    @settings(max_examples=10, deadline=None)
    def check(vals, n):
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v long"
        )
        out = exact_ntile(df, n, order_by=[F.col("v"), F.col("id")])
        got = {r["id"]: r["bucket"] for r in out.collect()}

        order = sorted(range(len(vals)), key=lambda i: (vals[i], i))
        N = len(vals)
        q, m = divmod(N, n)
        want = {}
        for pos, i in enumerate(order, start=1):
            if q == 0:
                want[i] = pos
            elif pos <= m * (q + 1):
                want[i] = (pos + q) // (q + 1)
            else:
                want[i] = m + ((pos - m * (q + 1)) + q - 1) // q
        assert got == want

    check()


def test_global_running_kernels_match_numpy_hypothesis(spark):
    """Randomized check of the three distributed ranking kernels against
    numpy cumulative ops under the (value, id) tie-broken total order,
    with and without partition_by — random group sizes, all-equal order
    keys, negative values."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.operators.ranking import (
        global_prefix_sum,
        global_running_max,
        global_running_min,
    )

    rows_strat = st.lists(
        st.tuples(st.integers(0, 2), st.integers(-5, 5), st.integers(-100, 100)),
        min_size=1,
        max_size=30,
    )

    @given(rows_strat, st.booleans())
    @settings(max_examples=8, deadline=None)
    def check(rows, partitioned):
        data = [(i, g, v, x) for i, (g, v, x) in enumerate(rows)]
        df = spark.createDataFrame(data, "id long, g long, v long, x long")
        pb = ["g"] if partitioned else []
        order = [F.col("v"), F.col("id")]

        def ref_groups():
            groups = {}
            for i, g, v, x in data:
                groups.setdefault(g if partitioned else 0, []).append((v, i, x))
            for evs in groups.values():
                evs.sort()
            return groups

        ps = {r["id"]: r["cx"] for r in global_prefix_sum(df, order, {"x": "cx"}, partition_by=pb).collect()}
        rmin = {r["id"]: r["mx"] for r in global_running_min(df, order, {"x": "mx"}, partition_by=pb).collect()}
        rmax = {r["id"]: r["Mx"] for r in global_running_max(df, order, {"x": "Mx"}, partition_by=pb).collect()}
        for evs in ref_groups().values():
            run = 0
            for pos, (v, i, x) in enumerate(evs):
                run += x
                assert ps[i] == run
                prev = [e[2] for e in evs[:pos]]
                assert rmin[i] == (min(prev) if prev else None)
                assert rmax[i] == (max(prev) if prev else None)

    check()
