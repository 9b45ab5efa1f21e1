"""Round-6 late batch: independent brute-force references for the new
catalog queries — pandas/numpy reimplementations that share NO code (and
no SQL dialect) with either the Spark query or its DuckDB oracle, so a
conceptual bug common to both sides still gets caught."""

import hashlib
import math
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_sorted_neighborhood_completeness(spark):
    """The floor(rank/w) bucket join must emit EXACTLY the pairs a plain
    all-pairs |rank diff| <= w scan finds (pigeonhole completeness) —
    checked against a pandas brute force over the fully sorted file."""
    got = {
        (r["custkey_a"], r["custkey_b"])
        for r in Q.queries()["sorted_neighborhood_linkage"](spark, SF).collect()
    }
    cust = pd.read_parquet(f"{SF}/customer.parquet")[
        ["c_custkey", "c_nationkey", "c_acctbal"]
    ].sort_values(["c_acctbal", "c_custkey"]).reset_index(drop=True)
    want = set()
    w = 3
    for i in range(len(cust)):
        for j in range(i + 1, min(i + w + 1, len(cust))):
            a, b = cust.iloc[i], cust.iloc[j]
            if a.c_nationkey == b.c_nationkey and abs(b.c_acctbal - a.c_acctbal) <= 1.0:
                want.add((int(a.c_custkey), int(b.c_custkey)))
    assert got == want


def test_sprt_matches_sequential_reference(spark):
    """The distributed prefix-count walk must reproduce a literal
    one-row-at-a-time sequential SPRT."""
    row = Q.queries()["sprt_urgent_rate"](spark, SF).collect()[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[
        ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ].sort_values(["o_orderdate", "o_orderkey"]).reset_index(drop=True)
    k = 0
    decided = None
    for t, prio in enumerate(orders.o_orderpriority, start=1):
        k += 1 if prio == "1-URGENT" else 0
        llr = float(k) * 0.6931 + float(t - k) * (-0.1178)
        if llr >= 2.9444 or llr <= -2.9444:
            decided = (t, k, round(llr, 4), "accept_h1" if llr >= 2.9444 else "accept_h0")
            break
    assert decided is not None
    assert (row["t_decision"], row["k_decision"], row["llr_decision"], row["decision"]) == decided
    assert row["n_trials"] == len(orders)


def test_mann_kendall_matches_reference(spark):
    """Integer S / tie-corrected variance / z against a direct O(n^2)
    pandas computation of the same 1995 daily-cents series."""
    row = Q.queries()["mann_kendall_daily_revenue"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderdate", "o_totalprice"]]
    o = o[(o.o_orderdate >= "1995-01-01") & (o.o_orderdate < "1996-01-01")]
    cents = (o.o_totalprice * 100).round().astype("int64")
    daily = cents.groupby(o.o_orderdate.dt.date).sum().sort_index().to_numpy()
    n = len(daily)
    s = sum(
        int(np.sign(daily[j] - daily[i]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    _, counts = np.unique(daily, return_counts=True)
    tie = int(sum(int(t) * (int(t) - 1) * (2 * int(t) + 5) for t in counts))
    var = (float(n) * float(n - 1) * float(2 * n + 5) - float(tie)) / 18.0
    znum = float(s - 1) if s > 0 else (float(s + 1) if s < 0 else 0.0)
    z = round(znum / math.sqrt(var), 4)
    assert row["n_days"] == n
    assert row["s_stat"] == s
    assert row["var_s"] == round(var, 4)
    assert row["z"] == z


def test_winsorized_mean_matches_reference(spark):
    """Integer-cents clamp against pandas linear-interpolated quantiles
    (the same interpolation contract as Spark's exact percentile)."""
    got = {
        r["segment"]: r
        for r in Q.queries()["winsorized_mean_by_segment"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_totalprice"]]
    c = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")

    def half_up(x):  # Spark/DuckDB round() is HALF_UP; Python's is banker's
        return math.floor(x + 0.5)

    for seg, g in j.groupby("c_mktsegment"):
        lo = half_up(g.o_totalprice.quantile(0.05, interpolation="linear") * 100)
        hi = half_up(g.o_totalprice.quantile(0.95, interpolation="linear") * 100)
        cents = (g.o_totalprice * 100).round().astype("int64")
        wc = cents.clip(lo, hi)
        r = got[seg]
        assert r["n"] == len(g)
        assert r["p05"] == lo / 100.0
        assert r["p95"] == hi / 100.0
        assert r["winsorized_mean"] == round(float(wc.sum()) / float(len(g)) / 100.0, 4)


def half_up6(x):
    """6-dp HALF_UP away from zero — matches Spark/DuckDB round();
    Python's round() is banker's and diverges on exact half boundaries."""
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def test_mutual_knn_pairs_match_numpy(spark):
    """Reciprocal top-1 pairs against a numpy within-cell brute force
    using the same sign-bit cells, rounding, and tie-break."""
    got = {
        (r["id_a"], r["id_b"])
        for r in Q.queries()["mutual_knn_match_embeddings"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb.vec_id.to_numpy()
    V = np.stack(emb.embedding.to_numpy()).astype("float64")
    nrm = np.sqrt((V * V).sum(axis=1))
    cells = (
        (V[:, :6] > 0).astype("int64") * (2 ** np.arange(6, dtype="int64"))
    ).sum(axis=1)
    best = {}
    for cell in np.unique(cells):
        idx = np.where(cells == cell)[0]
        for i in idx:
            cands = []
            for jj in idx:
                if ids[jj] == ids[i]:
                    continue
                sim = half_up6(float(V[i] @ V[jj]) / (float(nrm[i]) * float(nrm[jj])))
                cands.append((-sim, int(ids[jj])))
            if cands:
                best[int(ids[i])] = min(cands)[1]
    want = {
        (a, b) for a, b in best.items() if a < b and best.get(b) == a
    }
    assert got == want


def test_bloom_fpr_matches_hashlib(spark):
    """Observed false-positive count against a pure-hashlib partitioned
    bloom probe — pins the md5 position portability end-to-end."""
    row = Q.queries()["bloom_fpr_calibration"](spark, SF).collect()[0]
    M, K = 4096, 3
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    keys = set(cust[cust.c_acctbal > 7500.0].c_custkey.astype("int64"))

    def pos(v, seed):
        h = hashlib.md5(f"b{seed}:{v}".encode()).hexdigest()[:15]
        return int(h, 16) % M

    arrays = [{pos(k, i) for k in keys} for i in range(K)]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey"]]
    neg = [v for v in orders.o_custkey.astype("int64") if v not in keys]
    fp = sum(1 for v in neg if all(pos(v, i) in arrays[i] for i in range(K)))
    assert row["n_build_keys"] == len(keys)
    assert row["n_negatives"] == len(neg)
    assert row["n_false_positives"] == fp
