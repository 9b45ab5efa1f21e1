"""Unit semantics for operators/temporal.py: as-of join (backward,
inclusive, tolerance) and range join (keyed, bucketed-grid, unkeyed)."""

import datetime as dt
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.operators.temporal import asof_join, range_join  # noqa: E402


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "a"),
            (1, _ts("2024-01-01T12:00:00"), "b"),
            (1, _ts("2024-01-01T08:00:00"), "c"),  # before any right row
            (2, _ts("2024-01-01T10:30:00"), "d"),  # key with no right rows
        ],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 1.0),
            (1, _ts("2024-01-01T11:00:00"), 2.0),
            (1, _ts("2024-01-01T12:00:00"), 3.0),  # exact tie with left "b"
        ],
        "k int, rts timestamp, v double",
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        values=["v"], matched_ts="mts",
    )
    got = {r["tag"]: (r["v"], r["mts"]) for r in out.collect()}
    assert got["a"] == (1.0, _ts("2024-01-01T09:00:00"))
    assert got["b"] == (3.0, _ts("2024-01-01T12:00:00"))  # tie matches (inclusive)
    assert got["c"] == (None, None)
    assert got["d"] == (None, None)
    assert out.count() == left.count()  # left-join cardinality


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        values=["v"], tolerance=F.expr("INTERVAL 30 MINUTES"), matched_ts="mts",
    )
    got = {r["tag"]: r["v"] for r in out.collect()}
    assert got["a"] is None  # match is 60 min old, outside tolerance
    assert got["b"] == 3.0  # exact tie, age 0
    assert got["d"] is None


def test_asof_drops_matched_ts_when_unnamed(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", values=["v"])
    assert set(out.columns) == {"k", "ts", "tag", "v"}


def test_range_join_bucketed_equals_plain(spark):
    points = spark.createDataFrame(
        [(1, _ts(f"2024-01-01T{h:02d}:30:00"), h) for h in range(24)],
        "k int, ts timestamp, pid int",
    )
    ivs = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T03:00:00"), _ts("2024-01-01T06:30:00"), "i1"),
            (1, _ts("2024-01-01T20:00:00"), _ts("2024-01-01T20:30:00"), "i2"),
            (2, _ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), "i3"),
        ],
        "k int, s timestamp, e timestamp, iid string",
    )
    kw = dict(point_ts="ts", start_ts="s", end_ts="e", on=["k"])
    plain = {(r["pid"], r["iid"]) for r in range_join(points, ivs, bucket=None, **kw).collect()}
    grid = {(r["pid"], r["iid"]) for r in range_join(points, ivs, bucket="2 hours", **kw).collect()}
    assert grid == plain
    assert (3, "i1") in plain and (7, "i1") not in plain
    # inclusive bounds: point at 20:30 is inside i2's closing bound
    assert (20, "i2") in plain


def test_range_join_unkeyed_grid(spark):
    points = spark.createDataFrame(
        [(_ts("2024-01-01T01:30:00"), 1), (_ts("2024-01-03T01:30:00"), 2)],
        "ts timestamp, pid int",
    )
    ivs = spark.createDataFrame(
        [(_ts("2024-01-01T00:00:00"), _ts("2024-01-02T00:00:00"), "i1")],
        "s timestamp, e timestamp, iid string",
    )
    out = range_join(points, ivs, point_ts="ts", start_ts="s", end_ts="e",
                     on=[], bucket="6 hours")
    assert [(r["pid"], r["iid"]) for r in out.collect()] == [(1, "i1")]


def test_asof_plan_single_shuffle(spark):
    """The whole as-of join must be ONE exchange on the key (plus the
    right side's pre-aggregation) — never a range cross-product."""
    left, right = _frames(spark)
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts", values=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_interval_overlap_join_exact_and_single_copy(spark):
    """Overlapping pairs come back exactly once even when the pair shares
    many grid cells (long intervals)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from simpletasks_data_spark.operators.temporal import interval_overlap_join

    def ts(d):
        return dt.datetime(2024, 1, d)

    rows_a = [(1, "a1", ts(1), ts(20)), (1, "a2", ts(25), ts(26)), (2, "a3", ts(1), ts(2))]
    rows_b = [(1, "b1", ts(5), ts(28)), (1, "b2", ts(21), ts(22)), (2, "b3", ts(3), ts(4))]
    a = spark.createDataFrame(rows_a, "k int, a_id string, a_s timestamp, a_e timestamp")
    b = spark.createDataFrame(rows_b, "k int, b_id string, b_s timestamp, b_e timestamp")
    out = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", on=["k"], bucket="2 days")
    pairs = sorted((r["a_id"], r["b_id"]) for r in out.collect())
    # a1×b1 overlap across ~8 shared 2-day cells -> exactly ONE row;
    # a2×b1 overlap; a1×b2 disjoint (b2 starts day 21 > a1 ends day 20);
    # a2×b2 disjoint; a3×b3 disjoint (ends day 2 < starts day 3)
    assert pairs == [("a1", "b1"), ("a2", "b1")]
    assert out.count() == len(set(pairs))


def test_asof_matches_pandas_merge_asof_hypothesis(spark):
    """Randomized semantics check against pandas.merge_asof (an
    independent implementation of backward-inclusive as-of with
    tolerance): same matched value for every left row, across random
    key/timestamp shapes — keys with no right rows, left rows before
    any right row, exact ties, sparse and dense timelines. Right
    (key, ts) pairs are unique by construction (equal-timestamp
    matches are tie-ambiguous in any asof engine)."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    base = dt.datetime(2024, 1, 1)

    left_strat = st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 50)), min_size=1, max_size=12
    )
    right_strat = st.sets(
        st.tuples(st.integers(1, 2), st.integers(0, 50)), max_size=12
    )
    tol_strat = st.sampled_from([None, 5, 20])

    @given(left_strat, right_strat, tol_strat)
    @settings(max_examples=10, deadline=None)
    def check(lrows, rrows, tol):
        left_pd = pd.DataFrame(
            {
                "idx": range(len(lrows)),
                "k": [k for k, _ in lrows],
                "ts": [base + dt.timedelta(minutes=m) for _, m in lrows],
            }
        )
        right_pd = pd.DataFrame(
            {
                "k": pd.array([k for k, _ in sorted(rrows)], dtype="int64"),
                "rts": pd.to_datetime(
                    [base + dt.timedelta(minutes=m) for _, m in sorted(rrows)]
                ),
                # value is a function of (k, ts): no tie ambiguity
                "v": pd.array(
                    [float(k * 1000 + m) for k, m in sorted(rrows)], dtype="float64"
                ),
            }
        )
        want_df = pd.merge_asof(
            left_pd.sort_values("ts", kind="stable"),
            right_pd.sort_values("rts", kind="stable"),
            left_on="ts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
            tolerance=None if tol is None else pd.Timedelta(minutes=tol),
        )
        want = dict(zip(want_df["idx"], [None if pd.isna(v) else v for v in want_df["v"]]))

        left = spark.createDataFrame(left_pd, "idx long, k long, ts timestamp")
        right = (
            spark.createDataFrame(right_pd, "k long, rts timestamp, v double")
            if len(right_pd)
            else spark.createDataFrame([], "k long, rts timestamp, v double")
        )
        out = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="rts", values=["v"],
            tolerance=None if tol is None else F.expr(f"INTERVAL {tol} MINUTES"),
        )
        got = {r["idx"]: r["v"] for r in out.collect()}
        assert got == want

    check()


def test_range_join_matches_bruteforce_hypothesis(spark):
    """Randomized containment check for BOTH range-join physical paths —
    keyed (hash join + post-filter) and unkeyed bucketed-grid (interval
    exploded into overlapped cells) — against a brute-force double loop.
    Shapes: degenerate [t, t] intervals, overlapping intervals, points on
    interval bounds (inclusive), intervals spanning many grid cells."""
    from hypothesis import given, settings, strategies as st

    base = dt.datetime(2024, 1, 1)

    pts_strat = st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 120)), min_size=1, max_size=10
    )
    ivs_strat = st.lists(
        st.tuples(st.integers(1, 2), st.integers(0, 120), st.integers(0, 120)),
        min_size=1,
        max_size=6,
    )

    @given(pts_strat, ivs_strat)
    @settings(max_examples=8, deadline=None)
    def check(prows, irows):
        irows = [(k, min(a, b), max(a, b)) for k, a, b in irows]
        points = spark.createDataFrame(
            [(i, k, base + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(prows)],
            "pid long, k long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                (j, k, base + dt.timedelta(minutes=a), base + dt.timedelta(minutes=b))
                for j, (k, a, b) in enumerate(irows)
            ],
            "iid long, k long, start timestamp, end timestamp",
        )
        want_keyed = {
            (i, j)
            for i, (pk, m) in enumerate(prows)
            for j, (ik, a, b) in enumerate(irows)
            if pk == ik and a <= m <= b
        }
        want_unkeyed = {
            (i, j)
            for i, (_, m) in enumerate(prows)
            for j, (_, a, b) in enumerate(irows)
            if a <= m <= b
        }

        # keyed path: hash join + post-filter
        keyed_on = range_join(
            points, intervals, "ts", "start", "end", on=["k"], bucket=None
        )
        got_on = {(r["pid"], r["iid"]) for r in keyed_on.collect()}
        assert got_on == want_keyed
        # unkeyed bucketed-grid path (small grid => intervals span cells)
        bucketed = range_join(
            points, intervals.drop("k"), "ts", "start", "end",
            on=[], bucket="15 minutes",
        )
        got_b = {(r["pid"], r["iid"]) for r in bucketed.collect()}
        assert got_b == want_unkeyed

    check()


def test_interval_overlap_join_matches_bruteforce_hypothesis(spark):
    """Randomized interval-interval overlap vs a brute-force double loop
    (inclusive bounds, exactly-once emission however many grid cells a
    pair shares). Degenerate [t, t] intervals, touching endpoints, pairs
    spanning many 15-minute cells."""
    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.operators.temporal import interval_overlap_join

    base = dt.datetime(2024, 1, 1)
    iv = st.tuples(st.integers(1, 2), st.integers(0, 120), st.integers(0, 120))
    side = st.lists(iv, min_size=1, max_size=8)

    @given(side, side)
    @settings(max_examples=8, deadline=None)
    def check(arows, brows):
        arows = [(k, min(s, e), max(s, e)) for k, s, e in arows]
        brows = [(k, min(s, e), max(s, e)) for k, s, e in brows]
        a = spark.createDataFrame(
            [
                (i, k, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
                for i, (k, s, e) in enumerate(arows)
            ],
            "aid long, k long, a_s timestamp, a_e timestamp",
        )
        b = spark.createDataFrame(
            [
                (j, k, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=e))
                for j, (k, s, e) in enumerate(brows)
            ],
            "bid long, k long, b_s timestamp, b_e timestamp",
        )
        out = interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", on=["k"], bucket="15 minutes"
        )
        rows = [(r["aid"], r["bid"]) for r in out.collect()]
        got = sorted(rows)
        want = sorted(
            (i, j)
            for i, (ak, as_, ae) in enumerate(arows)
            for j, (bk, bs, be) in enumerate(brows)
            if ak == bk and as_ <= be and bs <= ae
        )
        assert got == want  # sorted lists: also proves exactly-once emission

    check()
