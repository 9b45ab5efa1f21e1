"""Brute-force pandas/numpy references for the round-7 query additions
(independent of both Spark and the DuckDB oracle)."""

import math
import os
import re
import sys
from collections import Counter

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _tokens(text):
    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def test_skipgram_pairs_match_python(spark):
    got = [
        (r["tok_a"], r["tok_b"], r["n_pairs"])
        for r in Q.queries()["skipgram_pairs_topk"](spark, SF).collect()
    ]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    c = Counter()
    for text in docs.text:
        toks = _tokens(text)
        for i, a in enumerate(toks):
            for k in (1, 2):
                if i + k < len(toks):
                    c[(a, toks[i + k])] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [(a, b, n) for (a, b), n in want]


def test_fano_matches_pandas(spark):
    got = {
        r["event_type"]: r for r in Q.queries()["fano_burstiness_events"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hr"] = ev.ts.dt.floor("h")
    for et, g in ev.groupby("event_type"):
        c = g.groupby("hr").size().to_numpy().astype("int64")
        if len(c) <= 1:
            assert et not in got
            continue
        n, s1, s2 = len(c), int(c.sum()), int((c * c).sum())
        mean = s1 / n
        var = (s2 - s1 * s1 / n) / (n - 1)
        r = got[et]
        assert r["n_hours"] == n and r["n_events"] == s1
        assert abs(r["mean_per_hour"] - mean) < 1e-5
        assert abs(r["fano_factor"] - var / mean) < 1e-5


def test_markov_rows_match_pandas(spark):
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["n_from"])
        for r in Q.queries()["markov_event_transitions"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    c = Counter()
    for _, g in ev.groupby("user_id"):
        et = list(g.event_type)
        for a, b in zip(et, et[1:]):
            c[(a, b)] += 1
    fr = Counter()
    for (a, _), n in c.items():
        fr[a] += n
    assert got == {k: (n, fr[k[0]]) for k, n in c.items()}


def test_anova_matches_numpy(spark):
    row = Q.queries()["anova_price_by_priority"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (o.o_totalprice * 100).round().astype("int64")
    groups = [cents[o.o_orderpriority == p].to_numpy() for p in sorted(o.o_orderpriority.unique())]
    k, nt = len(groups), len(cents)
    ssq = sum(float(g.sum()) ** 2 / len(g) for g in groups)
    ssb = ssq - float(cents.sum()) ** 2 / nt
    ssw = float((cents.astype(object) ** 2).sum()) - ssq
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert row["n_rows"] == nt and row["n_groups"] == k
    assert abs(row["f_stat"] - f) < 1e-4
    assert abs(row["ms_between"] - ssb / (k - 1) / 10000.0) < 0.01
    assert abs(row["ms_within"] - ssw / (nt - k) / 10000.0) < 0.01


def test_mad_outliers_match_numpy(spark):
    got = {
        r["c_mktsegment"]: r
        for r in Q.queries()["mad_outliers_by_segment"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_totalprice"]]
    c = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype("int64")

    def lower_median(a):
        a = np.sort(np.asarray(a))
        return int(a[(len(a) + 1) // 2 - 1])

    for seg, g in j.groupby("c_mktsegment"):
        med = lower_median(g.cents)
        adev = np.abs(g.cents.to_numpy() - med)
        mad = lower_median(adev)
        out = int((adev * 10000 > 44478 * mad).sum())
        r = got[seg]
        assert r["n"] == len(g)
        assert r["median_cents"] == med
        assert r["mad_cents"] == mad
        assert r["n_outliers"] == out


def test_bh_fdr_matches_numpy(spark):
    rows = Q.queries()["bh_fdr_urgent_nations"](spark, SF).collect()
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_custkey", "o_orderpriority"]]
    c = pd.read_parquet(f"{SF}/customer.parquet")[["c_custkey", "c_nationkey"]]
    n = pd.read_parquet(f"{SF}/nation.parquet")[["n_nationkey", "n_name"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey").merge(
        n, left_on="c_nationkey", right_on="n_nationkey"
    )
    j["u"] = (j.o_orderpriority == "1-URGENT").astype(int)
    g = j.groupby("n_name").agg(n=("u", "size"), x=("u", "sum"))
    p0 = g.x.sum() / g.n.sum()

    def pval(z):
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t
            - 0.284496736 * t**2
            + 1.421413741 * t**3
            - 1.453152027 * t**4
            + 1.061405429 * t**5
        )
        return poly * math.exp(-x * x)

    recs = []
    for name, r in g.iterrows():
        z = (r.x / r.n - p0) / math.sqrt(p0 * (1 - p0) / r.n)
        recs.append((name, int(r.n), int(r.x), z, pval(z)))
    recs.sort(key=lambda t: (t[4], t[0]))
    m = len(recs)
    kstar = max(
        (i + 1 for i, t in enumerate(recs) if t[4] <= 0.1 * (i + 1) / m), default=0
    )
    want = {
        t[0]: (t[1], t[2], i + 1, (i + 1) <= kstar) for i, t in enumerate(recs)
    }
    got = {
        r["n_name"]: (r["n"], r["x"], r["p_rank"], r["bh_reject_10"]) for r in rows
    }
    assert got == want
    for r in rows:
        name = r["n_name"]
        z = next(t[3] for t in recs if t[0] == name)
        assert abs(r["z"] - z) < 1e-5
        assert abs(r["p_value"] - pval(z)) < 1e-6


def test_ecod_matches_numpy(spark):
    rows = Q.queries()["ecod_outliers_embeddings"](spark, SF).collect()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    ids = emb.vec_id.to_numpy()
    V = np.stack(emb.embedding.to_numpy()).astype("float64")[:, :8]
    Qv = np.round(V * 1000).astype("int64")
    n = len(ids)
    scores = np.zeros(n, dtype="int64")
    for d in range(8):
        col = Qv[:, d]
        uniq, cnt = np.unique(col, return_counts=True)
        cum = np.cumsum(cnt)
        c = dict(zip(uniq, cum))
        ct = dict(zip(uniq, cnt))
        for i, v in enumerate(col):
            k = min(c[v], n - c[v] + ct[v])
            scores[i] += int(math.floor(math.log(n / k) * 1e6 + 0.5))
    order = sorted(zip(-scores, ids))[:20]
    want = [(int(i), round(-s / 1e6, 6)) for s, i in order]
    got = [(r["vec_id"], r["ecod_score"]) for r in rows]
    assert got == want


def test_lift_deciles_match_numpy(spark):
    rows = {r["decile"]: r for r in Q.queries()["lift_deciles_urgent"](spark, SF).collect()}
    import simpletasks_data_spark.queries as QQ

    feats = QQ._logreg_features(spark, SF)
    w = QQ._logreg_gd(feats, iterations=5, lr=1.0)
    pdf = feats.toPandas()
    p = 1.0 / (1.0 + np.exp(-(w[0] + w[1] * pdf.x1 + w[2] * pdf.x2)))
    df = pd.DataFrame({"k": pdf.o_orderkey, "y": pdf.y, "p": p}).sort_values(
        ["p", "k"], ascending=[False, True]
    )
    n = len(df)
    q, m = divmod(n, 10)
    sizes = [q + 1] * m + [q] * (10 - m)
    tot_pos, pos_so_far, n_so_far, start = df.y.sum(), 0, 0, 0
    for dec in range(1, 11):
        part = df.iloc[start : start + sizes[dec - 1]]
        start += sizes[dec - 1]
        n_so_far += len(part)
        pos_so_far += part.y.sum()
        r = rows[dec]
        assert r["n"] == len(part)
        assert r["n_pos"] == int(part.y.sum())
        lift = (pos_so_far / n_so_far) / (tot_pos / n)
        assert abs(r["cum_lift"] - lift) < 1e-5


def test_top_session_paths_match_pandas(spark):
    got = [
        (r["path"], r["n_users"])
        for r in Q.queries()["top_session_paths"](spark, SF).collect()
    ]
    ev = pd.read_parquet(f"{SF}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    paths = Counter(
        ">".join(g.event_type.head(3)) for _, g in ev.groupby("user_id")
    )
    want = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_rolling_origin_matches_pandas(spark):
    row = Q.queries()["rolling_origin_backtest"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["d"] = o.o_orderdate.dt.date
    o["c"] = (o.o_totalprice * 100).round().astype("int64")
    daily = o.groupby("d").c.sum().sort_index()
    cents = daily.to_numpy()
    errs = []
    for i in range(7, len(cents)):
        s7 = int(cents[i - 7 : i].sum())
        errs.append(abs(7 * int(cents[i]) - s7))
    assert row["n_days"] == len(errs)
    assert abs(row["mae"] - sum(errs) / (7 * len(errs)) / 100.0) < 1e-3
    assert abs(row["max_abs_err"] - max(errs) / 7.0 / 100.0) < 1e-3
