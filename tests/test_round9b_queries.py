"""Independent Python/pandas/numpy references, batch 2: the time-series
and information-theory statistics (EWMA, CUSUM, ACF, cross-correlation,
Theil-Sen, Benford, Gini, exact median, mutual information, JSD drift,
hash-seeded permutation test) — the formula-heaviest catalog queries
that until now were pinned only by the shared-formula DuckDB oracles."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _tokens(text):
    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def _rhu(x, nd):
    s = 10 ** nd
    return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s


def _orders():
    return pd.read_parquet(f"{SF}/orders.parquet")


def test_benford_matches_python(spark):
    got = {
        r["digit"]: (r["n_obs"], r["p_observed"], r["p_benford"], r["chi2_term"])
        for r in Q.queries()["benford_first_digit_orders"](spark, SF).collect()
    }
    o = _orders()
    digs = [int(str(int(math.floor(v)))[0]) for v in o.o_totalprice if v >= 1]
    total = len(digs)
    cnt = Counter(digs)
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        n_obs = cnt.get(d, 0)
        pb = math.log10(1 + 1 / d)
        g = got[d]
        assert g[0] == n_obs
        assert abs(g[1] - n_obs / total) < 1e-4
        assert abs(g[2] - pb) < 1e-4
        assert abs(g[3] - (n_obs - total * pb) ** 2 / (total * pb)) < 2e-3


def test_gini_matches_python(spark):
    got = {
        r["nation"]: (r["n_customers"], r["total_rev"], r["gini"])
        for r in Q.queries()["gini_revenue_by_nation"](spark, SF).collect()
    }
    o = _orders()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    j = o.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey"
    )
    pc = j.groupby(["n_name", "o_custkey"]).o_totalprice.sum().reset_index()
    pc["rev"] = pc.o_totalprice.map(lambda v: _rhu(v, 4))
    for nation, g in pc.groupby("n_name"):
        rows = sorted(g.itertuples(), key=lambda r: (r.rev, r.o_custkey))
        n = len(rows)
        tot = sum(r.rev for r in rows)
        wsum = sum((i + 1) * r.rev for i, r in enumerate(rows))
        gini = (2 * wsum - (n + 1) * tot) / (n * tot)
        gn, gt, gg = got[nation]
        assert gn == n
        assert abs(gt - tot) < 1e-3
        assert abs(gg - gini) < 1e-5


def test_exact_median_matches_python(spark):
    got = {
        r["o_orderpriority"]: (r["n"], r["median"])
        for r in Q.queries()["exact_median_price_by_priority"](spark, SF).collect()
    }
    o = _orders()
    o["cents"] = o.o_totalprice.map(lambda v: int(math.floor(v * 100 + 0.5)))
    for prio, g in o.groupby("o_orderpriority"):
        vals = sorted(g.cents)
        n = len(vals)
        med = vals[(n + 1) // 2 - 1]  # lower median, 1-based rank (n+1)//2
        assert got[prio] == (n, med), prio


def test_ewma_matches_python(spark):
    got = {
        (r["region"], pd.Timestamp(r["month"])): (r["revenue"], r["n_window"], r["ewma"])
        for r in Q.queries()["ewma_region_revenue"](spark, SF).collect()
    }
    o = _orders()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    nat = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    j = (
        o.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["month"] = pd.to_datetime(j.o_orderdate).dt.to_period("M").dt.start_time
    m = j.groupby(["r_name", "month"]).o_totalprice.sum().reset_index()
    m["revenue"] = m.o_totalprice.map(lambda v: _rhu(v, 4))
    for region, g in m.groupby("r_name"):
        rows = sorted(g.itertuples(), key=lambda r: r.month)
        for i, r in enumerate(rows):
            arr = [x.revenue for x in rows[max(0, i - 11) : i + 1]]
            n = len(arr)
            num = sum(v * 0.7 ** (n - 1 - k) for k, v in enumerate(arr))
            den = (1 - 0.7 ** n) / 0.3
            g_rev, g_n, g_ewma = got[(region, r.month)]
            assert g_n == n
            assert abs(g_rev - r.revenue) < 1e-3
            assert abs(g_ewma - num / den) < 1e-3


def test_cusum_matches_python(spark):
    got = {
        (r["event_type"], pd.Timestamp(r["hour"])): (r["n_events"], r["cusum"], r["alarm"])
        for r in Q.queries()["cusum_drift_events"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    hourly = (
        ev.assign(hr=ev.ts.dt.floor("h"))
        .groupby(["event_type", "hr"])
        .size()
        .reset_index(name="n")
    )
    for et, g in hourly.groupby("event_type"):
        mu = g.n.mean()
        sd = g.n.std(ddof=1)
        if math.isnan(sd):
            sd = 0.0
        s, smin = 0.0, 0.0
        for r in sorted(g.itertuples(), key=lambda r: r.hr):
            s += r.n - mu - 0.5 * sd
            smin = min(smin, s)
            c = s - min(smin, 0.0)
            gn, gc, ga = got[(et, r.hr)]
            assert gn == r.n
            assert abs(gc - c) < 1e-3
            assert ga == (c > 4.0 * sd)


def _pearson(pairs):
    n = len(pairs)
    sa = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    saa = sum(a * a for a, _ in pairs)
    sbb = sum(b * b for _, b in pairs)
    sab = sum(a * b for a, b in pairs)
    return (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )


def test_acf_matches_python(spark):
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in Q.queries()["acf_daily_revenue"](spark, SF).collect()
    }
    o = _orders()
    o["d"] = pd.to_datetime(o.o_orderdate).dt.date
    daily = o.groupby("d").o_totalprice.apply(
        lambda s: int(sum(math.floor(v) for v in s))
    )
    series = daily.to_dict()
    from datetime import timedelta

    for lag in (1, 7, 28):
        pairs = [
            (r, series[d + timedelta(days=lag)])
            for d, r in series.items()
            if d + timedelta(days=lag) in series
        ]
        assert got[lag][0] == len(pairs)
        assert abs(got[lag][1] - _pearson(pairs)) < 2e-5


def test_xcorr_matches_python(spark):
    got = {
        r["lag"]: (r["n_pairs"], r["xcorr"])
        for r in Q.queries()["xcorr_click_purchase"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev = ev[ev.event_type.isin(["click", "purchase"])]
    h = ev.ts.astype("datetime64[ns]").astype("int64") // (3600 * 10**9)
    c = Counter(h[ev.event_type == "click"])
    p = Counter(h[ev.event_type == "purchase"])
    for lag in (-6, -3, -1, 0, 1, 3, 6):
        pairs = [(cv, p[hh + lag]) for hh, cv in c.items() if (hh + lag) in p]
        assert got[lag][0] == len(pairs), lag
        assert abs(got[lag][1] - _pearson(pairs)) < 2e-5, lag


def test_theilsen_matches_numpy(spark):
    got = Q.queries()["theilsen_trend_revenue"](spark, SF).collect()[0]
    o = _orders()
    od = pd.to_datetime(o.o_orderdate)
    sel = o[(od >= "1995-01-01") & (od < "1995-07-01")].copy()
    sel["dday"] = (pd.to_datetime(sel.o_orderdate) - pd.Timestamp("1995-01-01")).dt.days
    sel["cents"] = sel.o_totalprice.map(lambda v: int(math.floor(v * 100 + 0.5)))
    daily = sel.groupby("dday").cents.sum()
    days = sorted(daily.index)
    slopes = [
        (daily[b] - daily[a]) / (b - a)
        for i, a in enumerate(days)
        for b in days[i + 1 :]
    ]
    assert got["n_days"] == len(days)
    assert got["n_pairs"] == len(slopes)
    assert abs(got["theilsen_cents_per_day"] - np.percentile(slopes, 50, method="linear")) < 2e-3
    x = np.array(days, dtype=float)
    y = np.array([daily[d] for d in days], dtype=float)
    ols = ((x - x.mean()) * (y - y.mean())).sum() / ((x - x.mean()) ** 2).sum()
    assert abs(got["ols_cents_per_day"] - ols) < 2e-3


def test_mutual_info_matches_python(spark):
    got = {
        r["feature"]: (r["n"], r["n_cells"], r["mi_nats"])
        for r in Q.queries()["mutual_info_features"](spark, SF).collect()
    }
    o = _orders()
    y = (o.o_orderpriority == "1-URGENT").astype(int)
    feats = {
        "price_bucket": o.o_totalprice.map(lambda v: min(int(math.floor(v / 20000)), 19)),
        "order_month": pd.to_datetime(o.o_orderdate).dt.month,
    }
    for feature, x in feats.items():
        nxy = Counter(zip(x, y))
        n = sum(nxy.values())
        nx = Counter()
        ny = Counter()
        for (xv, yv), c in nxy.items():
            nx[xv] += c
            ny[yv] += c
        mi = sum(
            (c / n) * math.log(c * n / (nx[xv] * ny[yv]))
            for (xv, yv), c in nxy.items()
        )
        g = got[feature]
        assert g[0] == n and g[1] == len(nxy)
        assert abs(g[2] - mi) < 2e-4


def test_jsd_drift_matches_python(spark):
    got = {
        r["source"]: (r["n_tokens"], r["vocab_src"], r["jsd_nats"])
        for r in Q.queries()["jsd_drift_by_source"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cs = defaultdict(Counter)
    for r in docs.itertuples():
        cs[r.source].update(_tokens(r.text))
    ct = Counter()
    for c in cs.values():
        ct.update(c)
    tt = sum(ct.values())
    for src, c in cs.items():
        ts = sum(c.values())
        present, q_present = 0.0, 0.0
        for tok, cnt in c.items():
            p = cnt / ts
            q = (ct[tok] - cnt) / (tt - ts)
            present += 0.5 * p * math.log(2 * p / (p + q))
            if q > 0:
                present += 0.5 * q * math.log(2 * q / (p + q))
            q_present += q
        jsd = present + 0.5 * math.log(2) * (1 - q_present)
        g = got[src]
        assert g[0] == ts and g[1] == len(c)
        assert abs(g[2] - jsd) < 2e-4, src


def test_permutation_test_matches_python(spark):
    got = Q.queries()["permutation_test_urgent_price"](spark, SF).collect()[0]
    o = _orders()
    y = o.o_totalprice.map(lambda v: int(math.floor(v)))
    t = (o.o_orderpriority == "1-URGENT").astype(int)
    keys = o.o_orderkey
    diffs = {}
    for perm in range(20):
        if perm == 0:
            g = t
        else:
            g = keys.map(
                lambda k: int(
                    int(
                        hashlib.md5(f"{k}:perm:{perm}".encode()).hexdigest()[:8], 16
                    ) % 5 == 0
                )
            )
        s1, n1 = int(y[g == 1].sum()), int((g == 1).sum())
        s0, n0 = int(y[g == 0].sum()), int((g == 0).sum())
        diffs[perm] = s1 / n1 - s0 / n0
    obs = diffs[0]
    extreme = sum(1 for p, d in diffs.items() if p > 0 and abs(d) >= abs(obs))
    assert got["n_perms"] == 19
    assert abs(got["observed_diff"] - obs) < 1e-5
    assert got["n_as_extreme"] == extreme
