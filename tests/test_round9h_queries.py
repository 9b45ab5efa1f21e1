"""Independent Python/pandas references, batch 8: profiling, quality
gates, temporal joins, and sampling — table profile, expectations, JSON
extraction, rolling features, PSI drift, blocked entity matching, as-of
and range joins, stratified sampling, basket pairs, decontamination, and
the vocabulary top-k."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict
from datetime import timedelta

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _tokens(text):
    norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    return [t for t in norm.split(" ") if t]


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_events_json_extract_matches_python(spark):
    got = {
        r["event_type"]: (r["total_k"], r["n"])
        for r in Q.queries()["events_json_extract"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    agg = defaultdict(lambda: [0, 0])
    for r in ev.itertuples():
        m = re.search(r'"k":\s*(\d+)', r.props)
        a = agg[r.event_type]
        a[0] += int(m.group(1)) if m else 0
        a[1] += 1
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_profile_orders_matches_pandas(spark):
    got = {
        r["col_name"]: r for r in Q.queries()["profile_orders"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    n = len(o)
    for col in ("o_orderkey", "o_custkey", "o_totalprice"):
        g = got[col]
        assert g["n_rows"] == n and g["null_count"] == int(o[col].isna().sum())
        assert g["distinct_count"] == o[col].nunique()
        assert abs(g["min_num"] - float(o[col].min())) < 1e-3
        assert abs(g["max_num"] - float(o[col].max())) < 1e-3
    for col in ("o_orderstatus", "o_orderpriority"):
        g = got[col]
        assert g["distinct_count"] == o[col].nunique()
        assert g["min_str"] == o[col].min() and g["max_str"] == o[col].max()
        assert abs(g["avg_len"] - o[col].str.len().mean()) < 1e-3
    g = got["o_orderdate"]
    assert g["distinct_count"] == o.o_orderdate.nunique()


def test_expectations_orders_matches_pandas(spark):
    got = {
        r["check"]: (r["violations"], r["n_rows"], r["passed"])
        for r in Q.queries()["expectations_orders"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    n = len(o)
    checks = {
        "orderkey_not_null": int(o.o_orderkey.isna().sum()),
        "totalprice_positive": int((o.o_totalprice <= 0).sum()),
        "status_enum": int((~o.o_orderstatus.isin(["O", "F", "P"])).sum()),
        "priority_format": int(
            (~o.o_orderpriority.str.match("^[1-5]-")).sum()
        ),
        "custkey_in_customer": int((~o.o_custkey.isin(c.c_custkey)).sum()),
        "unique_o_orderkey": int(o.o_orderkey.count() - o.o_orderkey.nunique()),
    }
    assert set(got) == set(checks)
    for k, v in checks.items():
        assert got[k] == (v, n, v == 0), k


def test_rolling_revenue_features_match_pandas(spark):
    got = {
        (r["custkey"], pd.Timestamp(r["month"])): (
            r["rev"], r["rev_ma3"], r["rev_cum"], r["rev_delta"]
        )
        for r in Q.queries()["rolling_revenue_features"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["month"] = pd.to_datetime(o.o_orderdate).dt.to_period("M").dt.start_time
    m = o.groupby(["o_custkey", "month"]).o_totalprice.sum().reset_index()
    m["rev"] = m.o_totalprice.map(lambda v: math.floor(v * 1e4 + 0.5) / 1e4)
    for ck, g in m.groupby("o_custkey"):
        rows = sorted(g.itertuples(), key=lambda r: r.month)
        cum = 0.0
        for i, r in enumerate(rows):
            win = [x.rev for x in rows[max(0, i - 2) : i + 1]]
            cum += r.rev
            prev = rows[i - 1].rev if i >= 1 else 0.0
            gg = got[(ck, r.month)]
            assert abs(gg[0] - r.rev) < 1e-3
            assert abs(gg[1] - sum(win) / len(win)) < 1e-3
            assert abs(gg[2] - cum) < 1e-3
            assert abs(gg[3] - (r.rev - prev)) < 1e-3


def test_feature_drift_psi_matches_python(spark):
    got = {
        r["bin"]: (r["n_ref"], r["n_cur"], r["psi_term"])
        for r in Q.queries()["feature_drift_psi"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    bins = o.o_totalprice.map(lambda v: min(int(math.floor(v / 20000.0)), 9))
    cur = pd.to_datetime(o.o_orderdate) >= "1998-07-01"
    cnt = defaultdict(lambda: [0, 0])
    for b, ic in zip(bins, cur):
        cnt[b][0 if not ic else 1] += 1
    tr = sum(v[0] for v in cnt.values())
    tc = sum(v[1] for v in cnt.values())
    assert set(got) == set(cnt)
    for b, (nr, nc) in cnt.items():
        p_ref = (nr + 0.5) / (tr + 5.0)
        p_cur = (nc + 0.5) / (tc + 5.0)
        g = got[b]
        assert g[0] == nr and g[1] == nc
        assert abs(g[2] - (p_cur - p_ref) * math.log(p_cur / p_ref)) < 1e-5


def _lev_le1(a, b):
    if a == b:
        return 0
    if abs(len(a) - len(b)) > 1:
        return 2
    # bounded check: substitution or single indel
    if len(a) == len(b):
        return 1 if sum(x != y for x, y in zip(a, b)) == 1 else 2
    if len(a) > len(b):
        a, b = b, a
    for i in range(len(b)):
        if b[:i] + b[i + 1 :] == a:
            return 1
    return 2


def test_entity_match_matches_python(spark):
    got = sorted(
        (r["id_a"], r["id_b"], r["c_nationkey"], r["distance"])
        for r in Q.queries()["entity_match_customers"](spark, SF).collect()
    )
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    want = []
    for nk, g in cust.groupby("c_nationkey"):
        rows = sorted(g.itertuples(), key=lambda r: r.c_custkey)
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if abs(len(a.c_name) - len(b.c_name)) <= 1:
                    d = _lev_le1(a.c_name, b.c_name)
                    if d <= 1:
                        want.append((a.c_custkey, b.c_custkey, nk, d))
    assert got == sorted(want)


def test_asof_join_matches_python(spark):
    got = {
        r["event_id"]: (r["last_purchase_value"], r["purchase_ts"])
        for r in Q.queries()["asof_join_last_purchase"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    p = (
        ev[ev.event_type == "purchase"]
        .groupby(["user_id", "ts"])
        .value.max()
        .reset_index()
    )
    by_user = defaultdict(list)
    for r in p.itertuples():
        by_user[r.user_id].append((r.ts, r.value))
    for v in by_user.values():
        v.sort()
    assert len(got) == len(ev)
    for r in ev.itertuples():
        cands = [(t, v) for t, v in by_user.get(r.user_id, ()) if t <= r.ts]
        g = got[r.event_id]
        if not cands:
            assert g == (None, None), r.event_id
        else:
            t, v = cands[-1]
            assert g[0] == v and pd.Timestamp(g[1]) == t, r.event_id


def test_range_join_matches_python(spark):
    got = {
        r["purchase_id"]: (r["n_clicks"], r["click_value"])
        for r in Q.queries()["range_join_purchase_clicks"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    clicks = ev[ev.event_type == "click"]
    by_user = defaultdict(list)
    for r in clicks.itertuples():
        by_user[r.user_id].append((r.ts, r.value))
    H2 = timedelta(hours=2)
    want = {}
    for r in ev[ev.event_type == "purchase"].itertuples():
        cs = [
            v for t, v in by_user.get(r.user_id, ()) if r.ts <= t <= r.ts + H2
        ]
        if cs:
            want[r.event_id] = (len(cs), sum(cs))
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n and abs(got[k][1] - s) < 1e-3


def test_stratified_sample_matches_python(spark):
    got = {
        r["doc_id"]: (r["lang"], r["sample_rank"])
        for r in Q.queries()["corpus_stratified_sample"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for lang, g in docs.groupby("lang"):
        ranked = sorted(g.doc_id, key=lambda d: (_h60(str(d)), d))
        for i, d in enumerate(ranked[:25]):
            want[d] = (lang, i + 1)
    assert got == want


def test_basket_brand_pairs_match_python(spark):
    got = {
        (r["brand_a"], r["brand_b"]): r["support"]
        for r in Q.queries()["basket_brand_pairs"](spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet")
    ob = li.merge(part, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    pairs = Counter()
    for _, g in ob.groupby("l_orderkey"):
        brands = sorted(g.p_brand)
        for i, a in enumerate(brands):
            for b in brands[i + 1 :]:
                pairs[(a, b)] += 1
    assert got == {k: v for k, v in pairs.items() if v >= 20}


def test_decontaminate_overlap_matches_python(spark):
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"], r["contaminated"])
        for r in Q.queries()["decontaminate_benchmark_overlap"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    grams = {
        r.doc_id: {
            " ".join(ts[i : i + 3]) for i in range(len(ts) - 2)
        }
        for r in docs.itertuples()
        for ts in [_tokens(r.text)]
    }
    bench = set()
    for d, g in grams.items():
        if d % 20 == 0:
            bench |= g
    want = {}
    for d, g in grams.items():
        if d % 20 == 0 or not g:
            continue
        hits = len(g & bench)
        want[d] = (len(g), hits, hits / len(g) >= 0.5)
    assert got == want


def test_vocab_top_tokens_matches_python(spark):
    got = [
        (r["token"], r["n_occurrences"])
        for r in Q.queries()["vocab_top_tokens"](spark, SF).collect()
    ]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter()
    for t in docs.text:
        cnt.update(_tokens(t))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    assert got == want
