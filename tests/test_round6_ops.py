"""Round-6 operators: Hilbert index vs the classic xy2d reference,
grid DBSCAN on a handcrafted plane."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from simpletasks_data_spark.queries import with_hilbert_index_16  # noqa: E402
from simpletasks_data_spark.operators.similarity import dbscan_grid_2d  # noqa: E402


def _xy2d_ref(order, x, y):
    """Classic top-down Hilbert xy2d (Wikipedia's iterative form)."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_reference(spark):
    pts = [(x * 4721 % 65536, (x * 911 + 37) % 65536) for x in range(300)]
    pts += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 0), (0, 1)]
    df = spark.createDataFrame(pts, "x: long, y: long")
    got = {
        (r["x"], r["y"]): r["d"]
        for r in with_hilbert_index_16(df, F.col("x"), F.col("y")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d_ref(65536, x, y), (x, y)


def test_hilbert_locality_beats_morton_worst_jump(spark):
    # consecutive Hilbert codes are adjacent cells: along a sample walk of
    # consecutive d values the (x, y) step is always 1 — verified via the
    # inverse walk on the reference; here check injectivity on a dense tile
    tile = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(tile, "x: long, y: long")
    ds = [r["d"] for r in with_hilbert_index_16(df, F.col("x"), F.col("y")).collect()]
    assert len(set(ds)) == len(tile)  # injective on the tile


def test_dbscan_grid_two_blobs_and_noise(spark):
    # blob A around (0..2, 0..2): 9 points; blob B around (100..102, 100..102);
    # one isolated noise point; eps=3 (eps^2=9 covers the blob diameter), minPts=5
    blob_a = [(i, x, y) for i, (x, y) in enumerate((x, y) for x in (0, 1, 2) for y in (0, 1, 2))]
    blob_b = [(i + 100, x + 100, y + 100) for i, (x, y) in enumerate((x, y) for x in (0, 1, 2) for y in (0, 1, 2))]
    noise = [(999, 50, 50)]
    df = spark.createDataFrame(blob_a + blob_b + noise, "id: long, x: long, y: long")
    out = {r["id"]: (r["cluster_id"], r["role"]) for r in
           dbscan_grid_2d(df, "id", "x", "y", eps=3, min_pts=5).collect()}
    assert out[999] == (-1, "noise")
    a_clusters = {out[i][0] for i, _, _ in blob_a}
    b_clusters = {out[i][0] for i, _, _ in blob_b}
    assert a_clusters == {0}      # min id in blob A
    assert b_clusters == {100}    # min id in blob B
    assert all(out[i][1] == "core" for i, _, _ in blob_a)  # all 9 within eps of each other


def test_dbscan_grid_matches_bruteforce_hypothesis(spark):
    """Property: dbscan_grid_2d == brute-force DBSCAN (min-label
    variant) on random integer point sets — grid candidate generation
    must not lose any eps-neighbor across cell boundaries."""
    from hypothesis import given, settings, strategies as st

    pts_strategy = st.lists(
        st.tuples(st.integers(min_value=-40, max_value=40),
                  st.integers(min_value=-40, max_value=40)),
        min_size=1, max_size=40, unique=True,
    )

    def brute(points, eps, min_pts):
        ids = {i: (x, y) for i, (x, y) in enumerate(points)}
        nb = {
            i: [j for j in ids if j != i
                and (ids[i][0] - ids[j][0]) ** 2 + (ids[i][1] - ids[j][1]) ** 2 <= eps * eps]
            for i in ids
        }
        cores = {i for i in ids if len(nb[i]) + 1 >= min_pts}
        parent = {i: i for i in cores}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for i in cores:
            for j in nb[i]:
                if j in cores:
                    ra, rb = find(i), find(j)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
        # path-compress to the component MIN id (root is min by union rule)
        cluster = {i: find(i) for i in cores}
        out = {}
        for i in ids:
            if i in cores:
                out[i] = (cluster[i], "core")
            else:
                cl = [cluster[j] for j in nb[i] if j in cores]
                out[i] = (min(cl), "border") if cl else (-1, "noise")
        return out

    from pyspark.sql import functions as FF

    @given(pts_strategy)
    @settings(max_examples=8, deadline=None)
    def check(points):
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(points)], "id: long, x: long, y: long"
        )
        got = {
            r["id"]: (r["cluster_id"], r["role"])
            for r in dbscan_grid_2d(df, "id", "x", "y", eps=7, min_pts=3).collect()
        }
        assert got == brute(points, 7, 3)

    check()


def test_interval_islands_matches_bruteforce_hypothesis(spark):
    """Property: the two-kernel islands sweep (global_running_max +
    global_prefix_sum) == a sequential python sweep on random interval
    sets, including heavy ties and full-overlap degeneracies."""
    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.operators.ranking import (
        global_prefix_sum,
        global_running_max,
    )
    from pyspark.sql import functions as FF

    ivs = st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),
                  st.integers(min_value=1, max_value=8)),
        min_size=1, max_size=30,
    )

    def brute(intervals):
        rows = sorted(
            (s, s + ln, k) for k, (s, ln) in enumerate(intervals)
        )
        islands = []
        for s, e, _ in rows:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        return sorted((i + 1, st_, en, n) for i, (st_, en, n) in enumerate(islands))

    @given(ivs)
    @settings(max_examples=8, deadline=None)
    def check(intervals):
        df = spark.createDataFrame(
            [(k, s, s + ln) for k, (s, ln) in enumerate(intervals)],
            "k: long, s: long, e: long",
        )
        order = ["s", "e", "k"]
        m = global_running_max(df, order, {"e": "pm"}, partitions=4)
        fl = m.withColumn(
            "flag", FF.when(FF.col("pm").isNull() | (FF.col("s") > FF.col("pm")), 1).otherwise(0)
        ).localCheckpoint(eager=True)
        isl = global_prefix_sum(fl, order, {"flag": "island"}, partitions=4)
        got = sorted(
            (r["island"], r["st"], r["en"], r["n"])
            for r in isl.groupBy("island")
            .agg(FF.min("s").alias("st"), FF.max("e").alias("en"),
                 FF.count(FF.lit(1)).alias("n"))
            .collect()
        )
        assert got == brute(intervals)

    check()


def test_hyperball_monotone_and_exact_on_tiny_graph(spark):
    """On a tiny graph, HyperBall's per-round reach must be monotone
    non-decreasing, keep n_nodes constant, and (registers being exact
    via linear counting at these set sizes) match the exact ball sizes
    from a brute-force BFS within 5%."""
    from simpletasks_data_spark.operators.graph import hyperball_neighborhood

    # path 1-2-3-4-5 plus a triangle 10-11-12
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "u: long, v: long")
    rows = {r["radius"]: r for r in hyperball_neighborhood(df, "u", "v", radius=3).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert len({r["n_nodes"] for r in rows.values()}) == 1 and rows[0]["n_nodes"] == 8
    reaches = [rows[t]["est_reach"] for t in range(4)]
    assert all(b >= a for a, b in zip(reaches, reaches[1:]))

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    exact = []
    for t in range(4):
        total = 0
        for n in adj:
            ball = {n}
            for _ in range(t):
                ball |= {w for x in ball for w in adj.get(x, ())}
            total += len(ball)
        exact.append(total)
    for est, ex in zip(reaches, exact):
        assert abs(est - ex) / ex < 0.05, (est, ex)


def test_bottomk_sample_quantiles_mergeable(spark):
    """Merge property: sketching the union == unioning two per-shard
    bottom-k samples and re-sketching — the property that lets shards
    sketch independently."""
    from pyspark.sql import functions as FF

    from simpletasks_data_spark.operators.sketches import bottomk_sample_quantiles

    full = spark.range(2000).select(
        F.col("id"), (F.hash(F.col("id") * 7) % 10000).alias("val")
    )
    k = 64
    whole = sorted(
        tuple(r) for r in bottomk_sample_quantiles(full, "val", F.col("id"), k=k).collect()
    )
    h = FF.conv(FF.substring(FF.md5(F.col("id").cast("string")), 1, 15), 16, 10).cast("long")
    shard_a = full.where(F.col("id") % 2 == 0).select("id", "val", h.alias("_h")).orderBy("_h").limit(k)
    shard_b = full.where(F.col("id") % 2 == 1).select("id", "val", h.alias("_h")).orderBy("_h").limit(k)
    merged = shard_a.unionByName(shard_b).select("id", "val")
    remerged = sorted(
        tuple(r) for r in bottomk_sample_quantiles(merged, "val", F.col("id"), k=k).collect()
    )
    assert whole == remerged
