"""Round-7b batch: independent brute-force references for the new
catalog queries — pandas/numpy reimplementations that share NO code (and
no SQL dialect) with either the Spark query or its DuckDB oracle, so a
conceptual bug common to both sides still gets caught."""

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _cents(series):
    # Spark/DuckDB round() is HALF_UP; python round is banker's
    return (series * 100 + 0.5).apply(math.floor).astype("int64")


def _top_decile_edges():
    """Python replica of _co_supply_top_decile_edges: co-supply pairs
    from lineitem, kept when support >= min{v : #pairs(n>=v) <=
    ceil(0.1*m)}."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    pairs = {}
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        ss = sorted(grp.l_suppkey.unique())
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pairs[(ss[i], ss[j])] = pairs.get((ss[i], ss[j]), 0) + 1
    m = len(pairs)
    k = math.ceil(0.1 * m)
    supports = sorted(set(pairs.values()))
    t = None
    for v in supports:
        if sum(1 for n in pairs.values() if n >= v) <= k:
            t = v
            break
    assert t is not None
    return {e for e, n in pairs.items() if n >= t}


def test_top_decile_edges_nondegenerate():
    """The decile rule must yield a non-complete graph at every SF —
    the fixed-floor version degenerated to complete graphs below
    sf0.1, leaving link prediction with zero candidates."""
    edges = _top_decile_edges()
    nodes = {x for e in edges for x in e}
    assert 0 < len(edges) < len(nodes) * (len(nodes) - 1) // 2


def test_link_prediction_matches_bruteforce(spark):
    edges = _top_decile_edges()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cand = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in edges:
                continue
            cn = len(adj[a] & adj[b])
            if cn > 0:
                jac = cn / (len(adj[a]) + len(adj[b]) - cn)
                cand.append((a, b, cn, jac))
    cand.sort(key=lambda r: (-round(r[3], 4), -r[2], r[0], r[1]))
    want = [(a, b, cn) for a, b, cn, _ in cand[:20]]
    got = Q.queries()["link_prediction_suppliers"](spark, SF).collect()
    assert [(r["supp_a"], r["supp_b"], r["common_neighbors"]) for r in got] == want
    for r, (_, _, _, jac) in zip(got, cand[:20]):
        assert r["jaccard"] == pytest.approx(jac, abs=1e-4)


def test_assortativity_matches_numpy(spark):
    edges = _top_decile_edges()
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    dx, dy = [], []
    for u, v in edges:
        dx += [deg[u], deg[v]]
        dy += [deg[v], deg[u]]
    r = np.corrcoef(np.array(dx, dtype=float), np.array(dy, dtype=float))[0, 1]
    row = Q.queries()["graph_degree_assortativity"](spark, SF).collect()[0]
    assert row["n_edge_ends"] == 2 * len(edges)
    assert row["mean_edge_deg"] == pytest.approx(np.mean(dx), abs=1e-3)
    # np.corrcoef divides by (n-1)-normalized std devs — same ratio
    assert row["assortativity"] == pytest.approx(r, abs=1e-3)


def test_welch_ttest_matches_numpy(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = _cents(o.o_totalprice).to_numpy(dtype=float)
    urgent = (o.o_orderpriority == "1-URGENT").to_numpy()
    x1, x2 = c[urgent], c[~urgent]
    m1, m2 = x1.mean(), x2.mean()
    v1, v2 = x1.var(ddof=1), x2.var(ddof=1)
    se2 = v1 / len(x1) + v2 / len(x2)
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / (
        (v1 / len(x1)) ** 2 / (len(x1) - 1) + (v2 / len(x2)) ** 2 / (len(x2) - 1)
    )
    row = Q.queries()["welch_ttest_urgent_price"](spark, SF).collect()[0]
    assert (row["n1"], row["n2"]) == (len(x1), len(x2))
    assert row["mean_diff"] == pytest.approx((m1 - m2) / 100.0, abs=1e-3)
    assert row["t_stat"] == pytest.approx(t, abs=1e-3)
    assert row["welch_df"] == pytest.approx(df, abs=0.05)


def test_cramers_v_matches_numpy(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_orderpriority"]]
    cu = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey")
    ct = pd.crosstab(j.o_orderpriority, j.c_mktsegment).to_numpy(dtype=float)
    n = ct.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = ((ct - e) ** 2 / e).sum()
    v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    row = Q.queries()["cramers_v_priority_segment"](spark, SF).collect()[0]
    assert row["n"] == int(n)
    assert row["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-3)
    assert row["cramers_v"] == pytest.approx(v, abs=1e-5)


def test_woe_iv_matches_numpy(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    bins = np.floor(o.o_totalprice / 25000.0).astype("int64")
    urgent = (o.o_orderpriority == "1-URGENT").astype(int)
    df = pd.DataFrame({"bin": bins, "u": urgent})
    g = df.groupby("bin").agg(n=("u", "size"), g=("u", "sum"))
    gt, bt, k = g.g.sum(), (g.n - g.g).sum(), len(g)
    pg = (g.g + 0.5) / (gt + 0.5 * k)
    pb = ((g.n - g.g) + 0.5) / (bt + 0.5 * k)
    woe = np.log(pg / pb)
    iv = ((pg - pb) * woe).sum()
    got = {r["bin"]: r for r in Q.queries()["woe_iv_price_bins"](spark, SF).collect()}
    assert set(got) == set(g.index)
    for b in g.index:
        assert got[b]["n"] == g.n[b] and got[b]["n_urgent"] == g.g[b]
        assert got[b]["woe"] == pytest.approx(woe[b], abs=1e-3)
        assert got[b]["iv_total"] == pytest.approx(iv, abs=1e-3)


def test_changepoint_matches_bruteforce(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        pd.DataFrame({"d": o.o_orderdate.dt.date, "c": _cents(o.o_totalprice)})
        .groupby("d").c.sum().sort_index()
    )
    y = daily.to_numpy(dtype=float)
    n, s = len(y), y.sum()
    best = None
    for t in range(1, n):
        st = y[:t].sum()
        score = st * st / t + (s - st) * (s - st) / (n - t)
        if best is None or score > best[0]:
            best = (score, t)
    row = Q.queries()["changepoint_daily_revenue"](spark, SF).collect()[0]
    assert row["left_days"] == best[1] and row["n_days"] == n
    assert str(row["change_date"]) == str(daily.index[best[1] - 1])
    t = best[1]
    assert row["mean_before"] == pytest.approx(y[:t].mean() / 100.0, abs=1e-3)
    assert row["mean_after"] == pytest.approx(y[t:].mean() / 100.0, abs=1e-3)


def test_holt_matches_python_fold(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_orderdate", "o_totalprice"]]
    cu = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_nationkey"]]
    na = pd.read_parquet(f"{SF}/nation.parquet")[["n_nationkey", "n_regionkey"]]
    rg = pd.read_parquet(f"{SF}/region.parquet")[["r_regionkey", "r_name"]]
    j = (
        o.merge(cu, left_on="o_custkey", right_on="c_custkey")
        .merge(na, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    j["d"] = j.o_orderdate.dt.date
    j["c"] = _cents(j.o_totalprice)
    got = {r["r_name"]: r for r in
           Q.queries()["holt_linear_region_forecast"](spark, SF).collect()}
    for r_name, grp in j.groupby("r_name"):
        ys = grp.groupby("d").c.sum().sort_index().to_numpy(dtype=float)
        l, b = ys[0], 0.0
        for yv in ys[1:]:
            nl = 0.5 * yv + 0.5 * (l + b)
            b = 0.3 * (nl - l) + 0.7 * b
            l = nl
        row = got[r_name]
        assert row["n_days"] == len(ys)
        assert row["level"] == pytest.approx(l / 100.0, abs=1e-3)
        assert row["trend"] == pytest.approx(b / 100.0, abs=1e-3)
        assert row["forecast_7d"] == pytest.approx((l + 7 * b) / 100.0, abs=1e-3)


def test_l_diversity_matches_pandas(spark):
    cu = pd.read_parquet(f"{SF}/customer.parquet")
    cu["bucket"] = np.floor(cu.c_acctbal / 1000.0).astype("int64")
    cls = cu.groupby(["c_nationkey", "bucket"]).agg(
        sz=("c_mktsegment", "size"), l=("c_mktsegment", "nunique")
    )
    got = {r["l_req"]: r for r in
           Q.queries()["l_diversity_customers"](spark, SF).collect()}
    for lr in (2, 3, 5):
        low = cls[cls.l < lr]
        assert got[lr]["n_classes"] == len(cls)
        assert got[lr]["n_low_classes"] == len(low)
        assert got[lr]["rows_at_risk"] == low.sz.sum()
        assert got[lr]["risk_pct"] == pytest.approx(
            low.sz.sum() / cls.sz.sum(), abs=1e-4
        )


def test_systematic_sample_matches_pandas(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet").sort_values(
        ["o_orderdate", "o_orderkey"]
    ).reset_index(drop=True)
    k = max(1, len(o) // 1000)
    want = o.iloc[::k].o_orderkey.tolist()
    got = Q.queries()["systematic_sample_orders"](spark, SF).collect()
    assert sorted(r["o_orderkey"] for r in got) == sorted(want)
    positions = sorted(r["position"] for r in got)
    assert positions == list(range(1, len(o) + 1, k))


def test_bollinger_matches_pandas(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_orderdate", "o_totalprice"]]
    cu = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_nationkey"]]
    na = pd.read_parquet(f"{SF}/nation.parquet")[["n_nationkey", "n_name"]]
    j = o.merge(cu, left_on="o_custkey", right_on="c_custkey").merge(
        na, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["d"] = j.o_orderdate.dt.date
    j["c"] = _cents(j.o_totalprice)
    want = set()
    for n_name, grp in j.groupby("n_name"):
        s = grp.groupby("d").c.sum().sort_index().astype(float)
        mean7 = s.rolling(7).mean()
        std7 = s.rolling(7).std(ddof=1)
        br = s[(abs(s - mean7) > 2.0 * std7)]
        want |= {(n_name, str(d)) for d in br.index}
    got = {
        (r["n_name"], str(r["d"]))
        for r in Q.queries()["bollinger_bands_nation"](spark, SF).collect()
    }
    assert got == want


def _pava(y, w):
    """Weighted pool-adjacent-violators on (value, weight) arrays."""
    vals, wts = list(map(float, y)), list(map(float, w))
    blocks = [[v, wt] for v, wt in zip(vals, wts)]
    out = []
    for blk in blocks:
        out.append(blk)
        while len(out) > 1 and out[-2][0] > out[-1][0] - 1e-15:
            v2, w2 = out.pop()
            v1, w1 = out.pop()
            out.append([(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2])
    fitted = []
    for v, wt in out:
        # expand back to the bins in the block (weights are bin counts,
        # possibly pooled) — reconstruct by consuming original weights
        fitted.append((v, wt))
    # expand: walk original weights through pooled blocks
    res, bi, remaining = [], 0, fitted[0][1]
    cur = fitted[0][0]
    for wt in wts:
        while remaining < wt - 1e-9:
            bi += 1
            cur, remaining = fitted[bi][0], fitted[bi][1]
        res.append(cur)
        remaining -= wt
        if remaining <= 1e-9 and bi + 1 < len(fitted):
            bi += 1
            cur, remaining = fitted[bi][0], fitted[bi][1]
    return res


def test_isotonic_matches_pava(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    bins = np.floor(o.o_totalprice / 25000.0).astype("int64")
    urgent = (o.o_orderpriority == "1-URGENT").astype(int)
    g = pd.DataFrame({"bin": bins, "u": urgent}).groupby("bin").agg(
        n=("u", "size"), pos=("u", "sum")
    ).sort_index()
    rates = (g.pos / g.n).to_numpy()
    fit = _pava(rates, g.n.to_numpy())
    got = sorted(
        Q.queries()["isotonic_calibration_urgent"](spark, SF).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in got] == list(g.index)
    iso = [r["iso_rate"] for r in got]
    # monotone nondecreasing (up to output rounding)
    assert all(b >= a - 1e-9 for a, b in zip(iso, iso[1:]))
    for r, f in zip(got, fit):
        assert r["iso_rate"] == pytest.approx(f, abs=1e-3)


def test_spearman_matches_scipy_style(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_totalprice"]]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey"]]
    y = li.groupby("l_orderkey").size().rename("y")
    j = o.set_index("o_orderkey").join(y, how="inner")
    x = _cents(j.o_totalprice).to_numpy()
    yv = j.y.to_numpy()
    rx = pd.Series(x).rank(method="average").to_numpy()
    ry = pd.Series(yv).rank(method="average").to_numpy()
    rho = np.corrcoef(rx, ry)[0, 1]
    row = Q.queries()["spearman_price_ordersize"](spark, SF).collect()[0]
    assert row["n_orders"] == len(j)
    assert row["spearman_rho"] == pytest.approx(rho, abs=1e-5)


def test_vocab_coverage_matches_pandas(spark):
    import re

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = []
    for t in docs.text:
        norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        toks.extend(w for w in norm.split(" ") if w)
    vc = pd.Series(toks).value_counts()
    # rank ties broken by token asc — value_counts sorts by count desc
    # only, so re-sort explicitly
    vc = vc.reset_index()
    vc.columns = ["token", "freq"]
    vc = vc.sort_values(["freq", "token"], ascending=[False, True]).reset_index(drop=True)
    total = vc.freq.sum()
    got = {r["k"]: r for r in Q.queries()["vocab_coverage_topk"](spark, SF).collect()}
    for k in (100, 1000, 10000):
        covered = vc.freq.iloc[:k].sum()
        assert got[k]["total_tokens"] == total
        assert got[k]["covered_tokens"] == covered
        assert got[k]["coverage"] == pytest.approx(covered / total, abs=1e-4)


def test_cochran_armitage_matches_numpy(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    w = o.o_orderpriority.str[0].astype(int).to_numpy()
    f = (o.o_orderstatus == "F").astype(int).to_numpy()
    N, R = len(w), f.sum()
    p = R / N
    T = (w * f).sum() - p * w.sum()
    var = p * (1 - p) * ((w * w).sum() - w.sum() ** 2 / N)
    z = T / math.sqrt(var)
    row = Q.queries()["cochran_armitage_priority_trend"](spark, SF).collect()[0]
    assert row["n_rows"] == N and row["n_groups"] == 5
    assert row["base_rate"] == pytest.approx(p, abs=1e-4)
    assert row["trend_z"] == pytest.approx(z, abs=1e-3)


def test_adamic_adar_matches_bruteforce(spark):
    edges = _top_decile_edges()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    cand = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in edges:
                continue
            cns = sorted(adj[a] & adj[b])
            if cns:
                aa = 0.0
                for wn in cns:
                    aa += 1.0 / math.log(len(adj[wn]))
                cand.append((a, b, len(cns), aa))
    cand.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    got = Q.queries()["adamic_adar_suppliers"](spark, SF).collect()
    assert [(r["supp_a"], r["supp_b"], r["common_neighbors"]) for r in got] == [
        (a, b, cn) for a, b, cn, _ in cand[:20]
    ]
    for r, (_, _, _, aa) in zip(got, cand[:20]):
        assert r["adamic_adar"] == pytest.approx(aa, abs=1e-5)


def test_rejection_sample_deterministic_and_lengthbiased(spark):
    rows1 = sorted(
        (r["lang"], r["n_accepted"])
        for r in Q.queries()["rejection_sample_bylength"](spark, SF).collect()
    )
    rows2 = sorted(
        (r["lang"], r["n_accepted"])
        for r in Q.queries()["rejection_sample_bylength"](spark, SF).collect()
    )
    assert rows1 == rows2  # same accept set on every run
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["lang"]: r for r in
           Q.queries()["rejection_sample_bylength"](spark, SF).collect()}
    for lang, grp in docs.groupby("lang"):
        row = got[lang]
        assert row["n_docs"] == len(grp)
        # accepted docs must be longer on average than the pool
        if row["n_accepted"] and row["n_accepted"] < row["n_docs"]:
            assert row["avg_chars_accepted"] > grp.n_chars.mean() * 0.95


def test_tokenizer_fertility_sane(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got = {r["lang"]: r for r in
           Q.queries()["tokenizer_fertility_by_lang"](spark, SF).collect()}
    assert set(got) == set(docs.lang.unique())
    for lang, r in got.items():
        assert r["n_docs"] == (docs.lang == lang).sum()
        # BPE-ish pretokens split punctuation off words: at least one
        # token per whitespace word, rarely more than 3x
        assert 1.0 <= r["fertility"] < 3.0


def test_ljung_box_matches_numpy(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        pd.DataFrame({"d": o.o_orderdate.dt.date,
                      "y": np.floor(o.o_totalprice).astype("int64")})
        .groupby("d").y.sum().sort_index()
    )
    y = daily.to_numpy(dtype=float)
    n = len(y)
    mu = y.mean()
    dev = y - mu
    g0 = (dev * dev).sum()
    rhos = {}
    for k in range(1, 8):
        rhos[k] = (dev[:-k] * dev[k:]).sum() / g0
    q = n * (n + 2) * sum(rhos[k] ** 2 / (n - k) for k in range(1, 8))
    got = {r["lag"]: r for r in
           Q.queries()["ljung_box_daily_revenue"](spark, SF).collect()}
    assert set(got) == set(range(1, 8))
    for k in range(1, 8):
        assert got[k]["n_days"] == n
        assert got[k]["rho"] == pytest.approx(rhos[k], abs=1e-4)
        assert got[k]["q_stat"] == pytest.approx(q, rel=1e-3)


def test_pr_curve_matches_bruteforce(spark):
    """Brute-force AP / best-F1 over the SAME scored frame (the GD
    weights themselves are pinned by the logreg tests + oracle; this
    checks the PR math independently of the kernel/quantized-sum
    plumbing)."""
    from simpletasks_data_spark.queries import _logreg_features, _logreg_gd
    import pyspark.sql.functions as F

    feats = _logreg_features(spark, SF)
    w = _logreg_gd(feats, iterations=5, lr=1.0, cache_key="full")
    z = F.lit(w[0]) + F.lit(w[1]) * F.col("x1") + F.lit(w[2]) * F.col("x2")
    pdf = feats.select("y", (1.0 / (1.0 + F.exp(-z))).alias("p")).toPandas()
    g = pdf.groupby("p").agg(n=("y", "size"), pos=("y", "sum")).sort_index(
        ascending=False
    )
    P = pdf.y.sum()
    tp = g.pos.cumsum()
    ctot = g.n.cumsum()
    ap = float((g.pos.to_numpy() * (tp / ctot).to_numpy()).sum() / P)
    f1 = float((2 * tp / (ctot + P)).max())
    row = Q.queries()["pr_curve_metrics_urgent"](spark, SF).collect()[0]
    assert row["n_pos"] == P and row["n_scores"] == len(g)
    assert row["pr_auc"] == pytest.approx(ap, abs=1e-4)
    assert row["best_f1"] == pytest.approx(f1, abs=1e-5)


def test_demographic_parity_consistency(spark):
    rows = Q.queries()["demographic_parity_urgent"](spark, SF).collect()
    assert len(rows) == 5  # five market segments
    nt = sum(r["n_orders"] for r in rows)
    pt = sum(r["n_pred_urgent"] for r in rows)
    overall = pt / nt
    o = pd.read_parquet(f"{SF}/orders.parquet")
    assert nt == len(o)
    for r in rows:
        assert 0 <= r["n_pred_urgent"] <= r["n_orders"]
        assert r["positive_rate"] == pytest.approx(
            r["n_pred_urgent"] / r["n_orders"], abs=1e-4
        )
        assert r["disparity_ratio"] == pytest.approx(
            (r["n_pred_urgent"] / r["n_orders"]) / overall, abs=1e-3
        )


def test_acid_schema_evolution_snapshots(spark):
    """Drive the log directly: v0 must not expose the evolved column,
    v1 must surface it with NULLs exactly on the pre-evolution rows."""
    rows = {r["version"]: r for r in
            Q.queries()["acid_schema_evolution"](spark, SF).collect()}
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    n = len(cust)
    n_gold = (cust.c_custkey % 10 == 0).sum()
    assert rows[0]["n_rows"] == n and rows[0]["n_cols"] == 3
    assert rows[0]["n_with_tier"] == 0
    assert rows[1]["n_rows"] == n + n_gold and rows[1]["n_cols"] == 4
    assert rows[1]["n_with_tier"] == n_gold


def test_minhash_scurve_consistency(spark):
    rows = Q.queries()["dedup_minhash_scurve"](spark, SF).collect()
    n_cand = Q.queries()["dedup_minhash"](spark, SF).count()
    assert sum(r["n_pairs"] for r in rows) == n_cand
    for r in rows:
        assert 0 <= r["agree"] <= 16
        s = r["agree"] / 16.0
        assert r["est_jaccard"] == pytest.approx(s, abs=1e-4)
        assert r["p_detect_theory"] == pytest.approx(
            1.0 - (1.0 - s ** 4) ** 4, abs=1e-5
        )
    # every band collision implies >= 4 agreeing positions is NOT
    # guaranteed (different bands can collide via md5 of the 4-tuple),
    # but the bulk must sit at agree >= 4
    bulk = sum(r["n_pairs"] for r in rows if r["agree"] >= 4)
    assert bulk >= 0.9 * n_cand


def test_shot_changes_matches_frame_recompute(spark):
    """Recompute cuts in pandas from the SAME mapInPandas frame sampler
    output — pins the window/threshold logic independently of the
    hex-deriving oracle."""
    from simpletasks_data_spark.queries import load
    from simpletasks_data_spark.operators.multimodal import (
        attach_fake_payloads, sample_frames,
    )

    docs = load(spark, SF, "documents")
    frames = sample_frames(attach_fake_payloads(docs, "doc_id", "text")).select(
        "media_id", "frame_idx", "checksum"
    ).toPandas()
    want = {}
    for mid, grp in frames.sort_values("frame_idx").groupby("media_id"):
        cs = grp.checksum.to_numpy()
        cuts = np.where(np.abs(np.diff(cs)) > 2000)[0]
        if len(cuts):
            want[mid] = (len(cs), len(cuts), int(cuts[0]) + 1)
    got = {
        r["media_id"]: (r["n_frames"], r["n_shot_changes"], r["first_change_idx"])
        for r in Q.queries()["multimodal_shot_changes"](spark, SF).collect()
    }
    assert got == want


def test_ngram_jaccard_ppjoin_matches_bruteforce(spark):
    """The PPJoin aggregate filters (k-prefix cnt>=2 + merge-step
    positional bound) must be EXACT: compare against a brute-force
    all-pairs Jaccard over the same 5-gram hash sets, on a fixture built
    to stress the filters — a shared template (every doc shares many
    shingles), near-threshold pairs on both sides of t=0.6, and docs
    shorter than one shingle window."""
    from simpletasks_data_spark.operators.dedupe import ngram_jaccard_pairs

    template = "the quick brown fox jumps over the lazy dog while "
    rows = [
        (1, template + "alpha beta gamma delta"),
        (2, template + "alpha beta gamma delts"),   # near-dup of 1
        (3, template + "epsilon zeta eta theta!"),  # template-only overlap
        (4, template + "alpha beta gamma delta"),   # exact dup of 1
        (5, "completely unrelated text with no template at all here"),
        (6, template * 3),                          # much longer: length filter
        (7, "tiny"),                                # < n chars -> 0/1 shingles
        (8, "tiny"),                                # identical tiny doc
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "id", "text", n=5, threshold=0.6).collect()
    }

    # brute force over the same normalized 5-gram sets
    import pyspark.sql.functions as F
    from simpletasks_data_spark.functions.text import normalize_text, char_shingles_from_norm
    sets = {
        r["id"]: set(r["sh"])
        for r in df.select(
            "id",
            char_shingles_from_norm(normalize_text(F.col("text")), 5).alias("sh"),
        ).collect()
    }
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if round(j, 4) >= 0.6:
                want[(a, b)] = round(j, 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    # sanity on the fixture itself: it must exercise the edge shapes —
    # exact dup, near-threshold pass (3,6 at .6479) AND near-threshold
    # reject (3,4 at .5111), single-shingle docs (o=1, below the k=2
    # floor), and a fully unrelated doc
    assert (1, 4) in want and (1, 2) in want and (7, 8) in want
    assert (3, 6) in want and (3, 4) not in want
    assert not any(5 in pair for pair in want)


@pytest.mark.parametrize("threshold", [0.5, 0.6, 0.8])
def test_ngram_jaccard_ppjoin_randomized(spark, threshold):
    """Seeded randomized sweep on a 3-letter alphabet (maximal shingle
    collisions, heavy df ties in the rarest-first order) — the aggregate
    filters must stay exact across thresholds, including prefix-length
    rounding at t=0.5 (floor((1-t)sz) exact-integer boundary)."""
    import random

    from simpletasks_data_spark.operators.dedupe import ngram_jaccard_pairs

    rng = random.Random(42)
    rows = []
    for i in range(40):
        base = "".join(rng.choice("ab ") for _ in range(rng.randint(3, 30)))
        rows.append((i, base))
        if rng.random() < 0.4:  # planted near-dup: flip one char
            chars = list(base)
            chars[rng.randrange(len(chars))] = rng.choice("ab ")
            rows.append((100 + i, "".join(chars)))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "id", "text", n=3, threshold=threshold
        ).collect()
    }

    import pyspark.sql.functions as F
    from simpletasks_data_spark.functions.text import (
        char_shingles_from_norm,
        normalize_text,
    )

    sets = {
        r["id"]: set(r["sh"])
        for r in df.select(
            "id",
            char_shingles_from_norm(normalize_text(F.col("text")), 3).alias("sh"),
        ).collect()
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            j = round(len(sa & sb) / len(sa | sb), 4)
            if j >= threshold:
                want[(a, b)] = j
    assert set(got) == set(want)
    assert want, "fixture must plant at least one qualifying pair"


def test_minhash_signatures_match_python_md5(spark):
    """MinHash signatures vs a pure Python reimplementation of the whole
    chain — normalize, 5-char shingles, md5 60-bit hash, frozen universal
    family min over (a*x+b) mod P — on docs with repeated shingles,
    mixed case/punctuation, and sub-shingle lengths."""
    import hashlib

    from simpletasks_data_spark.operators.dedupe import (
        MERSENNE_P,
        MINHASH_COEFFS,
        minhash_signatures,
    )

    rows = [
        (1, "The QUICK brown fox... the quick brown fox!"),
        (2, "aaaaaaaaaaaaaaaaaaaaaa"),
        (3, "hi"),
        (4, "Mixed 123 digits & symbols #### 123 mixed"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: list(r["signature"])
        for r in minhash_signatures(df, "id", "text", n=5, num_hashes=8).collect()
    }

    import re

    def norm(t):
        return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip()

    def shingles(t, n=5):
        t = norm(t)
        if len(t) <= n:
            return {t}
        return {t[i:i + n] for i in range(len(t) - n + 1)}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for i, t in rows:
        hs = [h60(s) % MERSENNE_P for s in shingles(t)]
        want[i] = [
            min((a * x + b) % MERSENNE_P for x in hs)
            for a, b in MINHASH_COEFFS[:8]
        ]
    assert got == want


def test_simhash_matches_python_md5(spark):
    """SimHash vs a pure Python reimplementation: 32-bit token hash from
    the first 8 md5 hex digits, per-bit +/-1 sums over the token
    MULTISET (repeats weigh), sign -> bit. Repeated tokens, mixed case,
    single-token docs."""
    import hashlib

    from simpletasks_data_spark.operators.dedupe import simhash

    rows = [
        (1, "the cat sat on the mat the cat"),
        (2, "THE CAT sat ON the MAT the cat"),   # normalizes to doc 1
        (3, "completely different words here"),
        (4, "solo"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["simhash"] for r in simhash(df, "id", "text").collect()}

    import re

    def toks(t):
        return [
            w
            for w in re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", t.lower())).strip().split(" ")
            if w
        ]

    def h32(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)

    want = {}
    for i, t in rows:
        sums = [0] * 32
        for w in toks(t):
            h = h32(w)
            for b in range(32):
                sums[b] += 1 if (h >> b) & 1 else -1
        want[i] = sum((1 << b) for b in range(32) if sums[b] > 0)
    assert got == want
    assert got[1] == got[2]  # case/punct normalize to the same signature


def test_bpe_train_matches_python_loop(spark):
    """BPE merge training vs a classic Python greedy loop (Sennrich
    BPE): weighted adjacent-pair counts over the word-frequency table,
    argmax by (count desc, pair lexicographic), left-to-right
    non-overlapping merge application. The fixture forces the edge
    shapes: overlapping runs ('aaaa' — leftmost-wins), a tie broken
    lexicographically, multi-char symbols re-merging in later rounds,
    single-char words with no pairs."""
    from simpletasks_data_spark.operators.bpe import bpe_train

    words = {"aaaa": 3, "abab": 2, "ba": 2, "cd": 4, "cde": 1, "x": 9}
    df = spark.createDataFrame(list(words.items()), "word string, wcount long")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["freq"])
        for r in bpe_train(df, merges=6).orderBy("step").collect()
    ]

    seqs = {w: list(w) for w in words}
    want = []
    for step in range(1, 7):
        counts = {}
        for w, cnt in words.items():
            s = seqs[w]
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + cnt
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        want.append((step, pair[0], pair[1], counts[pair]))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == pair:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    assert got == want


def test_weighted_sample_without_replacement_matches_python_md5(spark):
    """Efraimidis-Spirakis draw vs a pure Python reimplementation of the
    identical md5-derived uniform and ln(u)/w key on the sf0.001
    documents: same selected SET, same ranks, keys to 1e-7 (libm log ulp
    headroom under the 1e-8 rounding)."""
    import hashlib
    import math

    import pandas as pd

    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "n_chars"]]
    docs = docs[docs.n_chars > 0]

    def es_key(doc_id, w):
        h = int(
            hashlib.md5(f"{doc_id}-es".encode()).hexdigest()[:15], 16
        )
        u = h / 1152921504606846976.0
        return math.log(u) / w

    keyed = sorted(
        (
            (-round(es_key(r.doc_id, r.n_chars), 8), r.doc_id)
            for r in docs.itertuples()
        )
    )[:50]
    want = {
        doc_id: (rnk, -negkey)
        for rnk, (negkey, doc_id) in enumerate(keyed, start=1)
    }

    got = {
        r["doc_id"]: (r["rnk"], r["es_key"])
        for r in Q.queries()["weighted_sample_without_replacement"](spark, SF).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-7, (d, got[d], want[d])
