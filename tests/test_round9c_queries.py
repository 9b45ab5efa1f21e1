"""Independent Python/pandas/numpy references, batch 3: regression and
governance statistics — closed-form OLS (3-feature Cramer solve and
per-group trend), Poisson bootstrap, seasonal indices, Laplace DP
release, two-pass heavy hitters, gaps-and-islands, trailing-window
z-scores, calendar forward fill, k-anonymity, price elasticity, OHLC
bars."""

import hashlib
import math
import os
import sys
from collections import Counter, defaultdict
from datetime import timedelta

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _tokens(text):
    import re

    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def test_bootstrap_mean_matches_python(spark):
    got = Q.queries()["bootstrap_mean_orders"](spark, SF).collect()[0]
    CDF = [0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
           0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
           0.9999167588507119, 0.9999897508033253, 0.9999978746481021]
    o = _orders()
    means = []
    for r in range(8):
        s = w = 0.0
        for k, v in zip(o.o_orderkey, o.o_totalprice):
            u = _h60(f"{k}-{r}") / 1152921504606846976.0
            wt = sum(1 for t in CDF if u > t)
            s += wt * v
            w += wt
        means.append(s / w)
    point = o.o_totalprice.mean()
    m = np.array(means)
    sd = m.std(ddof=1)
    assert abs(got["point_mean"] - point) < 1e-3
    assert abs(got["boot_mean"] - m.mean()) < 1e-3
    assert abs(got["boot_std"] - sd) < 1e-3
    assert abs(got["ci95_low"] - (point - 1.96 * sd)) < 2e-3
    assert abs(got["ci95_high"] - (point + 1.96 * sd)) < 2e-3


def test_ols_price_model_matches_numpy(spark):
    got = Q.queries()["ols_price_model"](spark, SF).collect()[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    x1 = li.l_quantity.map(math.floor).to_numpy(dtype=float)
    x2 = li.l_discount.map(lambda v: math.floor(v * 100 + 0.5)).to_numpy(dtype=float)
    y = li.l_extendedprice.map(math.floor).to_numpy(dtype=float)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    r2 = 1 - (resid ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert got["n"] == len(li)
    for b, want in zip(("b0", "b1", "b2"), beta):
        assert abs(got[b] - want) < 1e-3, b
    assert abs(got["r2"] - r2) < 1e-4


def test_ols_trend_by_nation_matches_numpy(spark):
    got = {
        r["nation"]: (r["n"], r["slope_per_day"], r["intercept"])
        for r in Q.queries()["ols_trend_by_nation"](spark, SF).collect()
    }
    o = _orders()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    j = o.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["x"] = (pd.to_datetime(j.o_orderdate) - pd.Timestamp("1992-01-01")).dt.days
    j["y"] = j.o_totalprice.map(math.floor)
    for nation, g in j.groupby("c_nationkey"):
        x = g.x.to_numpy(dtype=float)
        y = g.y.to_numpy(dtype=float)
        slope = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
        intercept = y.mean() - slope * x.mean()
        gn, gs, gi = got[nation]
        assert gn == len(g)
        assert abs(gs - slope) < 1e-6
        assert abs(gi - intercept) < 1e-3


def test_seasonal_index_matches_python(spark):
    got = {
        r["dow"]: (r["n_days"], r["avg_daily_revenue"], r["seasonal_index"])
        for r in Q.queries()["seasonal_index_revenue"](spark, SF).collect()
    }
    o = _orders()
    o["cents"] = o.o_totalprice.map(lambda v: int(math.floor(v * 100 + 0.5)))
    daily = o.groupby(pd.to_datetime(o.o_orderdate).dt.date).cents.sum()
    dows = {d: (pd.Timestamp(d).weekday() + 1) % 7 for d in daily.index}
    per = defaultdict(lambda: [0, 0])
    for d, c in daily.items():
        per[dows[d]][0] += 1
        per[dows[d]][1] += c
    n_all, sum_all = len(daily), int(daily.sum())
    overall = sum_all / n_all
    assert set(got) == set(per)
    for dow, (nd, sc) in per.items():
        g = got[dow]
        assert g[0] == nd
        assert abs(g[1] - sc / nd / 100.0) < 1e-3
        assert abs(g[2] - (sc / nd) / overall) < 1e-5


def test_dp_noisy_counts_matches_python(spark):
    got = {
        r["n_name"]: (r["n_true"], r["n_noisy"])
        for r in Q.queries()["dp_noisy_counts_nation"](spark, SF).collect()
    }
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    cnt = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey").groupby(
        "n_name"
    ).size()
    assert set(got) == set(cnt.index)
    for name, n_true in cnt.items():
        u = (_h60(f"dp:v1:{name}") % 1000000 + 0.5) / 1000000.0
        noise = -2.0 * math.copysign(1.0, u - 0.5) * math.log(1 - 2 * abs(u - 0.5))
        g = got[name]
        assert g[0] == n_true
        assert abs(g[1] - (n_true + noise)) < 1e-3, name


def test_heavy_hitters_matches_python(spark):
    got = [
        (r["token"], r["n_exact"], r["n_sample"])
        for r in Q.queries()["heavy_hitters_two_pass"](spark, SF).collect()
    ]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    samp, full = Counter(), Counter()
    for r in docs.itertuples():
        toks = _tokens(r.text)
        full.update(toks)
        if r.doc_id % 5 == 0:
            samp.update(toks)
    m = sum(samp.values())
    cand = {t: c for t, c in samp.items() if c * 2000 >= m}
    ranked = sorted(
        ((full[t], t) for t in cand), key=lambda p: (-p[0], p[1])
    )[:20]
    want = [(t, n, cand[t]) for n, t in ranked]
    assert got == want


def test_interval_islands_matches_python(spark):
    got = sorted(
        (r["island_id"], r["n_intervals"], r["start_day"], r["end_day"], r["span_days"])
        for r in Q.queries()["interval_islands_orders"](spark, SF).collect()
    )
    o = _orders()
    sel = o[o.o_orderkey % 53 == 0].copy()
    sel["s"] = (pd.to_datetime(sel.o_orderdate) - pd.Timestamp("1995-01-01")).dt.days
    sel["e"] = sel.s + 1 + sel.o_orderkey % 7
    rows = sorted(sel.itertuples(), key=lambda r: (r.s, r.e, r.o_orderkey))
    islands = []
    prev_max = None
    for r in rows:
        if prev_max is None or r.s > prev_max:
            islands.append([])
        islands[-1].append(r)
        prev_max = r.e if prev_max is None else max(prev_max, r.e)
    want = sorted(
        (
            i + 1,
            len(isl),
            min(r.s for r in isl),
            max(r.e for r in isl),
            max(r.e for r in isl) - min(r.s for r in isl),
        )
        for i, isl in enumerate(islands)
    )
    assert got == want


def test_events_anomaly_zscore_matches_python(spark):
    got = {
        (r["event_type"], pd.Timestamp(r["hour"])): (r["n"], r["zscore"], r["is_anomaly"])
        for r in Q.queries()["events_anomaly_zscore"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    hourly = (
        ev.assign(hour=ev.ts.dt.floor("h"))
        .groupby(["event_type", "hour"])
        .size()
        .reset_index(name="n")
    )
    for et, g in hourly.groupby("event_type"):
        rows = sorted(g.itertuples(), key=lambda r: r.hour)
        for i, r in enumerate(rows):
            win = [x.n for x in rows[max(0, i - 24) : i]]
            key = (et, r.hour)
            gn, gz, ga = got[key]
            assert gn == r.n
            if len(win) >= 12:
                mu = sum(win) / len(win)
                sig = math.sqrt(sum((v - mu) ** 2 for v in win) / len(win))
                if sig > 0:
                    z = (r.n - mu) / sig
                    assert gz is not None and abs(gz - z) < 2e-4, key
                    assert ga == (abs(z) > 3.0)
                    continue
            assert gz is None and ga is False, key


def test_forward_fill_matches_python(spark):
    got = {
        (r["nation"], r["day"]): (r["n_obs"], r["avg_price_ff"])
        for r in Q.queries()["timeseries_forward_fill_nation"](spark, SF).collect()
    }
    o = _orders()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    j = o.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["day"] = pd.to_datetime(j.o_orderdate).dt.date
    j = j[(j.day >= pd.Timestamp("1996-01-01").date()) & (j.day < pd.Timestamp("1996-04-01").date())]
    obs = j.groupby(["n_name", "day"]).o_totalprice.agg(["size", "mean"])
    dmin, dmax = j.day.min(), j.day.max()
    days = [dmin + timedelta(days=k) for k in range((dmax - dmin).days + 1)]
    want_rows = 0
    for nation in j.n_name.unique():
        last = None
        for d in days:
            want_rows += 1
            if (nation, d) in obs.index:
                sz, mean = obs.loc[(nation, d)]
                last = mean
            else:
                sz = 0
            gn, gff = got[(nation, d)]
            assert gn == sz, (nation, d)
            if last is None:
                assert gff is None
            else:
                assert gff is not None and abs(gff - last) < 2e-4, (nation, d)
    assert len(got) == want_rows


def test_k_anonymity_matches_python(spark):
    got = {
        r["k"]: (r["n_classes"], r["n_small_classes"], r["rows_at_risk"], r["risk_pct"])
        for r in Q.queries()["k_anonymity_customers"](spark, SF).collect()
    }
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    classes = Counter(
        (r.c_nationkey, r.c_mktsegment, math.floor(r.c_acctbal / 1000.0))
        for r in cust.itertuples()
    )
    total = sum(classes.values())
    for k in (2, 5, 10, 20):
        small = [sz for sz in classes.values() if sz < k]
        g = got[k]
        assert g[0] == len(classes)
        assert g[1] == len(small)
        assert g[2] == sum(small)
        assert abs(g[3] - sum(small) / total) < 1e-4


def test_price_elasticity_matches_numpy(spark):
    got = {
        r["p_brand"]: (r["n"], r["elasticity"], r["r2"])
        for r in Q.queries()["price_elasticity_brands"](spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[(j.l_quantity > 0) & (j.l_extendedprice > 0)]
    j["lp"] = np.log(j.l_extendedprice / j.l_quantity)
    j["lq"] = np.log(j.l_quantity)
    for brand, g in j.groupby("p_brand"):
        x = g.lp.to_numpy()
        y = g.lq.to_numpy()
        vx = ((x - x.mean()) ** 2).sum()
        slope = ((x - x.mean()) * (y - y.mean())).sum() / vx
        corr = np.corrcoef(x, y)[0, 1]
        gn, ge, gr = got[brand]
        assert gn == len(g)
        assert abs(ge - slope) < 2e-3
        assert abs(gr - corr ** 2) < 2e-3


def test_ohlc_matches_python(spark):
    got = {
        (pd.Timestamp(r["bucket_ts"]), r["event_type"]): (
            r["n"], r["open"], r["high"], r["low"], r["close"]
        )
        for r in Q.queries()["ohlc_hourly_events"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev.assign(
        bucket=ev.ts.dt.floor("h"),
        cents=ev.value.map(lambda v: int(math.floor(v * 100 + 0.5))),
    )
    agg = {}
    for (b, et), g in ev.groupby(["bucket", "event_type"]):
        rows = sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))
        cents = [r.cents for r in rows]
        agg[(b, et)] = (len(rows), cents[0], max(cents), min(cents), cents[-1])
    assert got == agg
