"""Independent Python/pandas/numpy references for the round-9 window
front — the split-hygiene / dedup-QA batch plus the older catalog
queries staged at positions 51+ (every one currently pinned only by
DuckDB oracle parity, which shares each formula). Same discipline as
test_round7_queries / test_round8_queries: recompute from the parquet
inputs with code that shares nothing with either engine."""

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


def _bucket(key, m):
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % m


def _rhu(x, nd):
    s = 10 ** nd
    return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_split_leakage_matches_python(spark):
    got = Q.queries()["split_leakage_ngram_overlap"](spark, SF).collect()[0]
    tg, hg, n_heldout = set(), set(), 0
    for r in _docs().itertuples():
        toks = _tokens(r.text)
        grams = {
            " ".join(toks[i : i + 8]) for i in range(len(toks) - 7)
        }
        if _bucket(r.doc_id, 100) < 90:
            tg |= grams
        else:
            n_heldout += 1
            hg |= grams
    leaked = len(hg & tg)
    assert got["n_heldout_docs"] == n_heldout
    assert got["n_heldout_grams"] == len(hg)
    assert got["n_leaked"] == leaked
    assert abs(got["leakage_rate"] - leaked / len(hg)) < 1e-5


def test_unigram_kl_matches_python(spark):
    got = Q.queries()["unigram_kl_train_heldout"](spark, SF).collect()[0]
    c1, c2 = Counter(), Counter()
    for r in _docs().itertuples():
        side = c1 if _bucket(r.doc_id, 100) < 90 else c2
        side.update(_tokens(r.text))
    vocab = set(c1) | set(c2)
    n1, n2, v = sum(c1.values()), sum(c2.values()), len(vocab)
    kl = 0.0
    for w in vocab:
        p = (c1[w] + 1) / (n1 + v)
        q = (c2[w] + 1) / (n2 + v)
        kl += p * math.log(p / q)
    assert (got["n_train_tokens"], got["n_heldout_tokens"], got["vocab"]) == (n1, n2, v)
    assert abs(got["kl_nats"] - kl) < 1e-5


def test_low_entropy_docs_match_python(spark):
    got = [
        (r["doc_id"], r["n_tokens"], r["n_distinct"], r["entropy"])
        for r in Q.queries()["low_entropy_docs"](spark, SF).collect()
    ]
    scored = []
    for r in _docs().itertuples():
        toks = _tokens(r.text)
        n = len(toks)
        if n < 10:
            continue
        c = Counter(toks)
        h = math.log(n) - sum(k * math.log(k) for k in c.values()) / n
        hq = math.floor(h * 1e6 + 0.5)
        scored.append((hq, r.doc_id, n, len(c)))
    scored.sort()
    want = [(d, n, nd, hq / 1e6) for hq, d, n, nd in scored[:20]]
    assert [(g[0], g[1], g[2]) for g in got] == [(w[0], w[1], w[2]) for w in want]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 2e-6


def test_packing_efficiency_matches_python(spark):
    got = {
        r["shard"]: (r["n_docs"], r["total_tokens"], r["n_packs"], r["fill_rate"])
        for r in Q.queries()["packing_efficiency_report"](spark, SF).collect()
    }
    agg = defaultdict(lambda: [0, 0])
    for r in _docs().itertuples():
        n = len(_tokens(r.text))
        if n > 0:
            a = agg[_bucket(r.doc_id, 8)]
            a[0] += 1
            a[1] += n
    assert set(got) == set(agg)
    for shard, (docs_n, tok) in agg.items():
        packs = (tok + 255) // 256
        g = got[shard]
        assert g[:3] == (docs_n, tok, packs)
        assert abs(g[3] - tok / (packs * 256)) < 1e-5


def test_quantile_normalize_matches_numpy(spark):
    got = {
        r["doc_id"]: (r["source"], r["n_chars"], r["norm_score"])
        for r in Q.queries()["quantile_normalize_sources"](spark, SF).collect()
    }
    docs = _docs()
    grid = np.percentile(
        docs.n_chars.to_numpy(dtype=float), np.arange(101), method="linear"
    )
    for src, g in docs.groupby("source"):
        rows = sorted(g.itertuples(), key=lambda r: (r.n_chars, r.doc_id))
        n = len(rows)
        for i, r in enumerate(rows):
            pr = 0.0 if n == 1 else i / (n - 1)
            idx = int(math.floor(pr * 100 + 0.5))
            want = _rhu(float(grid[idx]), 4)
            gs, gn, gv = got[r.doc_id]
            assert gs == src and gn == r.n_chars
            assert abs(gv - want) < 2e-4, (r.doc_id, gv, want)


def test_chi2_matches_numpy(spark):
    got = Q.queries()["chi2_lang_source_independence"](spark, SF).collect()[0]
    ct = pd.crosstab(_docs().lang, _docs().source).to_numpy(dtype=float)
    n = ct.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = ((ct - e) ** 2 / e).sum()
    dof = (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert got["dof"] == dof and got["n"] == int(n)
    assert abs(got["chi2"] - chi2) < 1e-3


def test_seasonal_anomaly_matches_pandas(spark):
    got = [
        (r["hour"], r["n_events"], r["baseline_mean"], r["deviation_score"], r["rank"])
        for r in Q.queries()["events_seasonal_anomaly"](spark, SF).collect()
    ]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    hourly = (
        ev.assign(hr=ev.ts.dt.floor("h"))
        .groupby("hr")
        .size()
        .reset_index(name="n")
    )
    hourly["slot"] = list(zip(hourly.hr.dt.dayofweek, hourly.hr.dt.hour))
    scored = []
    for slot, g in hourly.groupby("slot"):
        mu = g.n.mean()
        sd = g.n.std(ddof=1)
        if math.isnan(sd):
            sd = 0.0
        for r in g.itertuples():
            scored.append((r.hr, int(r.n), mu, _rhu((r.n - mu) / (sd + 1.0), 4)))
    scored.sort(key=lambda t: (-abs(t[3]), t[0]))
    want = [(h, n, mu, s, i + 1) for i, (h, n, mu, s) in enumerate(scored[:20])]
    assert [(pd.Timestamp(g[0]), g[1], g[4]) for g in got] == [
        (w[0], w[1], w[4]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) < 1e-3 and abs(g[3] - w[3]) < 2e-4


def test_cohort_ltv_matches_pandas(spark):
    got = {
        (pd.Timestamp(r["cohort"]), r["age_weeks"]): (
            r["n_users"], r["cohort_revenue"], r["cum_ltv_per_user"]
        )
        for r in Q.queries()["cohort_ltv_curve"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    week = lambda s: s.dt.to_period("W-SUN").dt.start_time  # Monday starts
    firsts = ev.groupby("user_id").ts.min().reset_index()
    firsts["cohort"] = week(firsts.ts)
    p = ev[ev.event_type == "purchase"].merge(
        firsts[["user_id", "cohort"]], on="user_id"
    )
    p["age_weeks"] = (
        (week(p.ts) - p.cohort).dt.days // 7
    ).astype(int)
    spend = p.groupby(["cohort", "age_weeks"]).value.sum()
    sizes = firsts.groupby("cohort").size()
    assert set(got) == set(spend.index)
    for cohort, g in spend.groupby(level=0):
        cum = 0.0
        for (c, age), rev in g.sort_index().items():
            cum += rev
            gn, grev, gltv = got[(pd.Timestamp(c), age)]
            assert gn == sizes[c]
            assert abs(grev - rev) < 1e-3
            assert abs(gltv - cum / sizes[c]) < 1e-3


def _floor_sec(ts):
    return ts.value // 10**9  # pandas ns -> floored epoch seconds


def test_funnel_time_matches_numpy(spark):
    got = Q.queries()["funnel_time_to_convert"](spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    hs = []
    for uid, g in ev.groupby("user_id"):
        tv = g[g.event_type == "view"].ts.min()
        tb = g[g.event_type == "purchase"].ts.min()
        if pd.isna(tv) or pd.isna(tb) or tb < tv:
            continue
        hs.append((_floor_sec(tb) - _floor_sec(tv)) / 3600.0)
    hs = np.array(hs)
    assert got["n_converters"] == len(hs)
    for col, q in (("p50_hours", 50), ("p90_hours", 90), ("p99_hours", 99)):
        assert abs(got[col] - np.percentile(hs, q, method="linear")) < 2e-4, col
    assert abs(got["mean_hours"] - hs.mean()) < 2e-4


def test_repeat_purchase_intervals_match_python(spark):
    got = {
        r["gap_days_bucket"]: (r["n_intervals"], r["mean_gap_hours"])
        for r in Q.queries()["repeat_purchase_intervals"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    p = ev[ev.event_type == "purchase"]
    agg = defaultdict(list)
    for uid, g in p.groupby("user_id"):
        rows = sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            gap_h = (_floor_sec(b.ts) - _floor_sec(a.ts)) // 3600
            agg[min(gap_h // 24, 7)].append(gap_h)
    assert set(got) == set(agg)
    for bucket, gaps in agg.items():
        assert got[bucket][0] == len(gaps)
        assert abs(got[bucket][1] - sum(gaps) / len(gaps)) < 1e-3


def test_sentence_split_stats_match_python(spark):
    got = {
        r["doc_id"]: (r["n_sentences"], r["n_chars_in_sents"], r["mean_sentence_len"])
        for r in Q.queries()["sentence_split_stats"](spark, SF).collect()
    }
    for r in _docs().itertuples():
        sents = [s.strip(" ") for s in re.split(r"[.!?]+", r.text)]
        sents = [s for s in sents if s]
        n = len(sents)
        total = sum(len(s) for s in sents)
        g = got[r.doc_id]
        assert g[0] == n and g[1] == total
        if n == 0:
            assert g[2] is None
        else:
            assert abs(g[2] - total / n) < 1e-3


def test_conversion_by_session_depth_matches_python(spark):
    got = {
        r["depth_bucket"]: (r["n_sessions"], r["n_converted"], r["conversion_rate"])
        for r in Q.queries()["conversion_by_session_depth"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    agg = defaultdict(lambda: [0, 0])
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))
        sessions = []
        cur = None
        for r in rows:
            if cur is None or (_floor_sec(r.ts) - _floor_sec(cur[-1].ts)) > 1800:
                cur = [r]
                sessions.append(cur)
            else:
                cur.append(r)
        for s in sessions:
            bucket = min(len(s), 6)
            agg[bucket][0] += 1
            agg[bucket][1] += int(any(x.event_type == "purchase" for x in s))
    assert set(got) == set(agg)
    for b, (ns, nc) in agg.items():
        assert got[b][0] == ns and got[b][1] == nc
        assert abs(got[b][2] - nc / ns) < 1e-4


def test_geo_nearest_warehouse_matches_python(spark):
    got = {
        r["c_custkey"]: (r["nearest_wid"], r["dist_km"])
        for r in Q.queries()["geo_nearest_warehouse"](spark, SF).collect()
    }
    WH = [(0, 48.85, 2.35), (1, 40.71, -74.0), (2, 35.68, 139.69),
          (3, -33.87, 151.21), (4, -1.29, 36.82)]
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    for k in cust.c_custkey:
        lat = (k % 180) - 90 + 0.5
        lon = ((k * 7) % 360) - 180 + 0.5
        best = None
        for wid, wlat, wlon in WH:
            d = 2 * 6371.0 * math.asin(math.sqrt(
                math.sin(math.radians(wlat - lat) / 2) ** 2
                + math.cos(math.radians(lat)) * math.cos(math.radians(wlat))
                * math.sin(math.radians(wlon - lon) / 2) ** 2
            ))
            key = (_rhu(d, 6), wid)
            if best is None or key < best:
                best = key
        assert got[k][0] == best[1], k
        assert abs(got[k][1] - best[0]) < 2e-4


def test_association_rules_match_python(spark):
    got = [
        (r["antecedent"], r["consequent"], r["sup"], r["rank"])
        for r in Q.queries()["association_rules_brands"](spark, SF).collect()
    ]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    part = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    ob = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    n_orders = ob.l_orderkey.nunique()
    item = ob.groupby("p_brand").size()
    pairs = Counter()
    for _, g in ob.groupby("l_orderkey"):
        brands = sorted(g.p_brand)
        for i, a in enumerate(brands):
            for b in brands[i + 1 :]:
                pairs[(a, b)] += 1
    rules = []
    for (a, b), sup in pairs.items():
        if sup < 20:
            continue
        lift = _rhu(sup * n_orders / (item[a] * item[b]), 4)
        rules.append((lift, a, b, sup))
        rules.append((lift, b, a, sup))
    rules.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, sup, i + 1) for i, (_, a, b, sup) in enumerate(rules[:20])]
    assert got == want


def test_kn_bigram_logprob_matches_python(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in Q.queries()["quality_bigram_kn_logprob"](spark, SF).collect()
    }
    D = 0.75
    doc_bgs = {}
    cnt = Counter()
    for r in _docs().itertuples():
        toks = _tokens(r.text)
        if len(toks) < 2:
            continue
        bgs = [(a, b) for a, b in zip(toks, toks[1:])]
        doc_bgs[r.doc_id] = bgs
        cnt.update(bgs)
    heads = defaultdict(lambda: [0, 0])  # c1, nright (distinct continuations)
    nleft = Counter()  # distinct left contexts per tail
    for (a, b), c in cnt.items():
        heads[a][0] += c
        heads[a][1] += 1
        nleft[b] += 1
    nbi = len(cnt)
    assert set(got) == set(doc_bgs)
    for did, bgs in doc_bgs.items():
        lp = 0.0
        for a, b in bgs:
            c1, nright = heads[a]
            p = max(cnt[(a, b)] - D, 0.0) / c1 + (D * nright / c1) * (nleft[b] / nbi)
            lp += math.log(p)
        g = got[did]
        assert g[0] == len(bgs)
        assert abs(g[1] - lp / len(bgs)) < 2e-4, did
