"""Incremental rollup refresh: equivalence with full recompute, and the
scale contract — untouched rollup rows must NOT shuffle."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simpletasks_data_spark.operators.incremental import (  # noqa: E402
    incremental_rollup_refresh,
)

PARTIAL = {"n": lambda: F.count(F.lit(1)).cast("long"), "s": lambda: F.sum("v")}
MERGE = {"n": lambda: F.sum("n").cast("long"), "s": lambda: F.sum("s")}


def _refresh(stored, batch):
    return incremental_rollup_refresh(
        stored,
        batch,
        keys=["b", "k"],
        partial={n: c() for n, c in PARTIAL.items()},
        merge={n: c() for n, c in MERGE.items()},
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_refresh_equals_full_recompute(spark):
    raw = spark.createDataFrame(
        [(b, k, float(b * 10 + len(k))) for b in range(6) for k in ("x", "yy")] * 3,
        "b int, k string, v double",
    )
    stored = (
        raw.where(F.col("b") < 3)
        .groupBy("b", "k")
        .agg(*[c().alias(n) for n, c in PARTIAL.items()])
        .localCheckpoint(eager=True)
    )
    batch = raw.where(F.col("b") >= 3)
    got = _refresh(stored, batch)
    want = raw.groupBy("b", "k").agg(*[c().alias(n) for n, c in PARTIAL.items()])
    assert _rows(got) == _rows(want)


def test_refresh_empty_batch_is_identity(spark):
    stored = spark.createDataFrame(
        [(1, "x", 2, 3.0)], "b int, k string, n long, s double"
    )
    batch = spark.createDataFrame([], "b int, k string, v double")
    assert _rows(_refresh(stored, batch)) == _rows(stored)


def test_untouched_stream_does_not_shuffle(spark):
    """The stored rollup's untouched branch must reach the output through
    broadcast anti-join only — no Exchange between the store and the
    union. (The store is checkpointed, so any Exchange above a
    Scan ExistingRDD in the anti branch would be a regression.)"""
    stored = spark.createDataFrame(
        [(b, "x", 1, float(b)) for b in range(100)],
        "b int, k string, n long, s double",
    ).localCheckpoint(eager=True)
    batch = spark.createDataFrame([(99, "x", 5.0)], "b int, k string, v double")
    df = _refresh(stored, batch)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    tree = buf.getvalue().split("\n\n")[0]
    assert "BroadcastHashJoin LeftAnti" in tree, tree
    anti = tree[tree.index("LeftAnti"):]
    # nodes below the anti-join on its stream side, up to the next join
    # branch: must contain the store scan with no Exchange above it
    assert "SortMergeJoin" not in tree, tree
    # The delta agg and touched-set distinct ran at checkpoint time; the
    # read-out plan may shuffle ONLY the affected-slice merge agg. The
    # untouched branch is Scan -> broadcast anti-join -> Union, nothing
    # else.
    assert tree.count("Exchange") - tree.count("BroadcastExchange") <= 1, tree


def test_incremental_join_refresh_three_terms(spark):
    """dA|x|B, A|x|dB, and dA|x|dB must each contribute exactly once:
    base ⋈ base rows must NOT appear in the delta."""
    from simpletasks_data_spark.operators.incremental import incremental_join_refresh

    A = spark.createDataFrame([(1, "a1"), (2, "a2")], "k long, av string")
    B = spark.createDataFrame([(1, "b1"), (3, "b3")], "k long, bv string")
    dA = spark.createDataFrame([(3, "a3")], "k long, av string")
    dB = spark.createDataFrame([(1, "b1x"), (3, "b3x")], "k long, bv string")
    got = sorted(
        (r["k"], r["av"], r["bv"])
        for r in incremental_join_refresh(A, B, dA, dB, on=["k"]).collect()
    )
    # dA⋈B: (3,a3,b3); A⋈dB: (1,a1,b1x); dA⋈dB: (3,a3,b3x)
    assert got == [(1, "a1", "b1x"), (3, "a3", "b3"), (3, "a3", "b3x")]

    # full-join equivalence: base-join + delta == join of the unions
    full = A.unionByName(dA).join(B.unionByName(dB), "k")
    base = A.join(B, "k")
    inc = base.unionByName(incremental_join_refresh(A, B, dA, dB, on=["k"]))
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, inc.collect()))
