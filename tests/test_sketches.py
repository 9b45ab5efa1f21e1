"""Sketch accuracy and plan-shape properties (operators/sketches.py)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.sketches import (  # noqa: E402
    hll_distinct,
    histogram_quantile,
    kmv_distinct,
)


def _data(spark, n=5000, groups=2):
    return spark.range(n).select(
        (F.col("id") % groups).cast("string").alias("g"),
        # ~n/4 distinct values per group
        F.concat(F.lit("v"), (F.col("id") % (n // 4)).cast("string")).alias("v"),
        (F.col("id") % 100).cast("double").alias("x"),
    )


def test_kmv_exact_below_k(spark):
    df = spark.range(30).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    row = kmv_distinct(df, "v", keys=["g"], k=64).collect()[0]
    assert row["n_kept"] == 30
    assert row["est_distinct"] == 30.0  # exact below k


def test_kmv_estimate_accuracy(spark):
    df = _data(spark)
    true = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    for r in kmv_distinct(df, "v", keys=["g"], k=256).collect():
        assert abs(r["est_distinct"] - true[r["g"]]) / true[r["g"]] < 0.25


def test_kmv_plan_group_limit(spark):
    """rank<=k must compile to WindowGroupLimit (map-side top-k), not a
    full per-group sort feeding an unbounded window."""
    df = _data(spark)
    plan = (
        kmv_distinct(df, "v", keys=["g"], k=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan


def test_hll_estimate_accuracy(spark):
    df = _data(spark, n=20000, groups=2)
    true = {
        r["g"]: r["d"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("d")).collect()
    }
    for r in hll_distinct(df, "v", keys=["g"], b=8).collect():
        # m=256 -> ~6.5% standard error; allow 3 sigma
        assert abs(r["est_distinct"] - true[r["g"]]) / true[r["g"]] < 0.20


def test_histogram_quantile_bounds(spark):
    df = _data(spark)  # x uniform over 0..99 per group
    out = histogram_quantile(
        df, "x", keys=["g"], width=10.0, quantiles={"p50": 0.5, "p90": 0.9}
    ).collect()
    for r in out:
        # true p50=49.5 -> bin 4 upper edge 50; p90=89.1 -> bin 8 edge 90
        assert r["p50"] == 50.0
        assert r["p90"] == 90.0


def test_cms_never_underestimates_and_merges(spark):
    from simpletasks_data_spark.operators.sketches import cms_estimate, cms_table
    import pyspark.sql.functions as F

    # skewed stream: token t0 x 500, t1..t40 x ~10 each — small w forces collisions
    rows = [("t0",)] * 500 + [(f"t{i}", ) for i in range(1, 41) for _ in range(10)]
    df = spark.createDataFrame(rows, "token string")
    cms = cms_table(df, "token", d=4, w=16)
    items = df.select("token").distinct()
    exact = df.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    est = cms_estimate(items, cms, "token", d=4, w=16)
    joined = exact.join(est, "token").collect()
    assert all(r["cms_est"] >= r["exact_n"] for r in joined)  # one-sided error
    top = max(joined, key=lambda r: r["exact_n"])
    assert top["token"] == "t0" and top["cms_est"] >= 500

    # mergeability: sketch(A) + sketch(B), re-aggregated, == sketch(A ∪ B)
    half1 = df.where(F.length("token") == 2)   # t0..t9
    half2 = df.where(F.length("token") != 2)   # t10..t40
    merged = (
        cms_table(half1, "token", d=4, w=16)
        .unionByName(cms_table(half2, "token", d=4, w=16))
        .groupBy("j", "bucket").agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    whole = cms_table(df, "token", d=4, w=16)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_kmv_estimate_matches_python_md5_hypothesis(spark):
    """Randomized EXACT-value check of the KMV estimator against a pure
    Python reimplementation of the same md5-derived uniform (first 60
    hex-digit bits / 2^60): same kept count and same rounded estimate,
    below and above k."""
    import hashlib

    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.operators.sketches import kmv_distinct

    rows_strat = st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 500)), min_size=1, max_size=60
    )
    k_strat = st.sampled_from([4, 8])

    @given(rows_strat, k_strat)
    @settings(max_examples=8, deadline=None)
    def check(rows, k):
        df = spark.createDataFrame(rows, "g long, v long")
        got = {
            r["g"]: (r["n_kept"], r["est_distinct"])
            for r in kmv_distinct(df, "v", ["g"], k=k).collect()
        }

        def u01(v):
            return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16) / float(1 << 60)

        want = {}
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, set()).add(v)
        for g, vals in by_g.items():
            us = sorted(u01(v) for v in vals)[:k]
            n_kept = len(us)
            est = float(n_kept) if n_kept < k else (k - 1) / us[-1]
            want[g] = (n_kept, round(est, 4))
        assert set(got) == set(want)
        for g in want:
            assert got[g][0] == want[g][0]
            assert abs(got[g][1] - want[g][1]) < 1e-9, (g, got[g], want[g])

    check()


def test_hll_registers_and_estimate_match_python_md5(spark):
    """HLL chain vs a pure Python reimplementation: register table
    (bucket = 60-bit md5 mod m, rho = leading-zeros+1 of the remaining
    bits) compared EXACTLY, the finalized estimate to 1e-4 (libm log ulp
    headroom). Includes the w==0 saturation path via the tiny register
    width used here (b=4 -> 56 value bits, never zero for these inputs,
    so saturation is additionally forced with a crafted register)."""
    import hashlib
    import math

    from simpletasks_data_spark.operators.sketches import (
        hll_distinct,
        hll_prepare,
    )

    b = 4
    m = 1 << b
    vals = [(i % 3, i * 7 + 1) for i in range(120)]
    df = spark.createDataFrame(vals, "g long, v long")

    got_regs = {
        (r["g"], r["_bucket"]): r["_reg"]
        for r in hll_prepare(df, "v", ["g"], b=b)
        .groupBy("g", "_bucket")
        .agg(F.max("_rho").alias("_reg"))
        .collect()
    }

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    wbits = 60 - b
    want_regs = {}
    for g, v in vals:
        h = h60(v)
        bucket, w = h % m, h >> b
        rho = (wbits + 1) if w == 0 else (wbits + 1 - w.bit_length())
        k = (g, bucket)
        want_regs[k] = max(want_regs.get(k, 0), rho)
    assert got_regs == want_regs

    got_est = {
        r["g"]: r["est_distinct"] for r in hll_distinct(df, "v", ["g"], b=b).collect()
    }
    alpha = 0.7213 / (1.0 + 1.079 / m)
    for g in {g for g, _ in vals}:
        regs = {bk: rho for (gg, bk), rho in want_regs.items() if gg == g}
        z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
        v_empty = m - len(regs)
        raw = alpha * m * m / z
        est = (
            m * math.log(m / v_empty)
            if (raw <= 2.5 * m and v_empty > 0)
            else raw
        )
        assert abs(got_est[g] - est) < 1e-4, (g, got_est[g], est)


def test_cms_table_and_estimate_match_python_md5(spark):
    """Count-Min chain vs pure Python md5 buckets — sketch counters and
    min-counter point estimates compared EXACTLY (all-integer), including
    the guaranteed-overestimate property."""
    import hashlib

    from simpletasks_data_spark.operators.sketches import cms_estimate, cms_table

    d, w = 3, 16  # tiny width => real collisions => real overestimates
    vals = [i % 7 for i in range(100)] + [99] * 5
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    cms = cms_table(df, "v", d=d, w=w)

    def bucket(j, v):
        return int(
            hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:15], 16
        ) % w

    want_cnt = {}
    for v in vals:
        for j in range(d):
            k = (j, bucket(j, v))
            want_cnt[k] = want_cnt.get(k, 0) + 1
    got_cnt = {(r["j"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert got_cnt == want_cnt

    items = spark.createDataFrame([(v,) for v in sorted(set(vals))], "v long")
    got_est = {
        r["v"]: r["cms_est"]
        for r in cms_estimate(items, cms, "v", d=d, w=w).collect()
    }
    true_cnt = {v: vals.count(v) for v in set(vals)}
    for v in true_cnt:
        want = min(want_cnt[(j, bucket(j, v))] for j in range(d))
        assert got_est[v] == want
        assert got_est[v] >= true_cnt[v]  # CMS never underestimates
