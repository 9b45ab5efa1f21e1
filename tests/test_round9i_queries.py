"""Independent Python references, batch 9: the gradient-descent
logistic-regression family — the exact integer-nano GD trajectory
recomputed row-at-a-time in python, then every consumer: train metrics,
tie-aware mid-rank AUC, calibration bins, split-conformal sets, k-fold
out-of-fold AUC, and the exact two-player Shapley attribution."""

import math
import os
import sys
from collections import defaultdict

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rhu(x, nd):
    s = 10 ** nd
    return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s


def _features():
    o = pd.read_parquet(f"{SF}/orders.parquet")
    days = (pd.to_datetime(o.o_orderdate) - pd.Timestamp("1992-01-01")).dt.days
    return [
        (int(k), 1.0 if pr == "1-URGENT" else 0.0, tp / 100000.0, d / 1000.0)
        for k, pr, tp, d in zip(o.o_orderkey, o.o_orderpriority, o.o_totalprice, days)
    ]


def _gd_multi(rows, chains, iterations=5, lr=1.0):
    ws = [[0.0, 0.0, 0.0] for _ in chains]
    for _ in range(iterations):
        for ci, (cond, mask) in enumerate(chains):
            w = ws[ci]
            S = [0, 0, 0]
            n = 0
            for okey, y, x1, x2 in rows:
                if cond is not None and not cond(okey):
                    continue
                z = w[0] + w[1] * x1 + w[2] * x2
                resid = y - 1.0 / (1.0 + math.exp(-z))
                for k, val in enumerate((resid, resid * x1, resid * x2)):
                    S[k] += math.floor(val * 1000000000.0 + 0.5)
                n += 1
            active = (1, mask[0], mask[1])
            ws[ci] = [
                _rhu(w[k] + lr * (S[k] / n / 1e9), 6) if active[k] else 0.0
                for k in range(3)
            ]
    return ws


def _score(rows, w):
    return [
        (okey, y, 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2))))
        for okey, y, x1, x2 in rows
    ]


def _auc(scored):
    groups = defaultdict(lambda: [0, 0])
    for _, y, p in scored:
        g = groups[p]
        g[0] += 1
        g[1] += int(y == 1.0)
    before = 0
    rank_sum = 0.0
    n1 = n0 = 0
    for p in sorted(groups):
        n, pos = groups[p]
        rank_sum += pos * (before + (n + 1) / 2.0)
        before += n
        n1 += pos
        n0 += n - pos
    return n1, n0, (rank_sum - n1 * (n1 + 1) / 2.0) / (n1 * 1.0 * n0)


def test_logreg_matches_python(spark):
    got = Q.queries()["logreg_urgent_orders"](spark, SF).collect()[0]
    rows = _features()
    w = _gd_multi(rows, [(None, (1, 1))])[0]
    assert (got["w0"], got["w1"], got["w2"]) == tuple(w)
    scored = _score(rows, w)
    ll = -sum(
        y * math.log(p) + (1 - y) * math.log(1 - p) for _, y, p in scored
    ) / len(scored)
    acc = sum(1 for _, y, p in scored if (p > 0.5) == (y == 1.0)) / len(scored)
    assert got["n"] == len(rows)
    assert abs(got["logloss"] - ll) < 1e-4
    assert abs(got["accuracy"] - acc) < 1e-4


def test_auc_matches_python(spark):
    got = Q.queries()["auc_urgent_orders"](spark, SF).collect()[0]
    rows = _features()
    w = _gd_multi(rows, [(None, (1, 1))])[0]
    n1, n0, auc = _auc(_score(rows, w))
    assert (got["n_positive"], got["n_negative"]) == (n1, n0)
    assert abs(got["auc"] - auc) < 1e-6


def test_calibration_bins_match_python(spark):
    got = {
        r["bin"]: (r["n"], r["mean_predicted"], r["frac_positive"], r["gap"])
        for r in Q.queries()["calibration_bins_urgent"](spark, SF).collect()
    }
    rows = _features()
    w = _gd_multi(rows, [(None, (1, 1))])[0]
    bins = defaultdict(list)
    for _, y, p in _score(rows, w):
        bins[min(int(math.floor(p * 10)), 9)].append((y, p))
    assert set(got) == set(bins)
    for b, vals in bins.items():
        mp = _rhu(sum(p for _, p in vals) / len(vals), 4)
        fp = _rhu(sum(y for y, _ in vals) / len(vals), 4)
        g = got[b]
        assert g[0] == len(vals)
        assert abs(g[1] - mp) < 1e-4 and abs(g[2] - fp) < 1e-4
        assert abs(g[3] - abs(mp - fp)) < 2e-4


def test_conformal_matches_python(spark):
    got = {
        r["true_class"]: (r["n"], r["coverage"], r["avg_set_size"], r["qhat"])
        for r in Q.queries()["conformal_urgent_orders"](spark, SF).collect()
    }
    rows = _features()
    w = _gd_multi(rows, [(lambda k: k % 5 >= 2, (1, 1))])[0]
    scored = _score(rows, w)
    cal = sorted(
        ((1.0 - (y * p + (1 - y) * (1 - p)), okey) for okey, y, p in scored if okey % 5 == 0)
    )
    n_cal = len(cal)
    k = (9 * (n_cal + 1) + 9) // 10
    qhat = cal[k - 1][0]
    per = defaultdict(lambda: [0, 0, 0])
    for okey, y, p in scored:
        if okey % 5 != 1:
            continue
        in0 = int(p <= qhat)
        in1 = int(1.0 - p <= qhat)
        a = per[int(y)]
        a[0] += 1
        a[1] += int((y == 1.0 and in1) or (y == 0.0 and in0))
        a[2] += in0 + in1
    assert set(got) == set(per)
    for cls, (n, cov, size) in per.items():
        g = got[cls]
        assert g[0] == n
        assert abs(g[1] - cov / n) < 1e-4
        assert abs(g[2] - size / n) < 1e-4
        assert abs(g[3] - qhat) < 1e-6


def test_kfold_auc_matches_python(spark):
    got = {
        r["fold"]: (r["n_positive"], r["n_negative"], r["auc"])
        for r in Q.queries()["kfold_cv_auc_urgent"](spark, SF).collect()
    }
    rows = _features()
    chains = [
        ((lambda k, f=f: k % 5 != f), (1, 1)) for f in range(5)
    ]
    ws = _gd_multi(rows, chains)
    for f in range(5):
        fold_rows = [r for r in rows if r[0] % 5 == f]
        n1, n0, auc = _auc(_score(fold_rows, ws[f]))
        g = got[f]
        assert (g[0], g[1]) == (n1, n0), f
        assert abs(g[2] - auc) < 1e-6, f


def test_shapley_matches_python(spark):
    got = {
        r["feature"]: (r["phi"], r["logloss_empty"], r["logloss_full"])
        for r in Q.queries()["shapley_logreg_features"](spark, SF).collect()
    }
    rows = _features()
    masks = [(0, 0), (1, 0), (0, 1), (1, 1)]
    ws = _gd_multi(rows, [(None, m) for m in masks])
    lls = []
    for w in ws:
        scored = _score(rows, w)
        lls.append(
            _rhu(
                -sum(y * math.log(p) + (1 - y) * math.log(1 - p) for _, y, p in scored)
                / len(scored),
                6,
            )
        )
    la, lb, lc, ld = lls
    phi1 = _rhu(0.5 * ((la - lb) + (lc - ld)), 6)
    phi2 = _rhu(0.5 * ((la - lc) + (lb - ld)), 6)
    for feat, phi in (("x1_price", phi1), ("x2_orderday", phi2)):
        g = got[feat]
        assert abs(g[0] - phi) < 2e-6, feat
        assert abs(g[1] - la) < 2e-6 and abs(g[2] - ld) < 2e-6
