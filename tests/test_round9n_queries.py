"""Independent Python references, batch 14: the dedup QA compositions
(cluster histogram, cross-layer matrix, bigstar equality, LSH
recall/precision eval), sketch set algebra (KMV, CMS join-size), the
learned-IVF kNN, exact substring spans, and the pivot/rollup/anti-join
report shapes."""

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
from tests.test_round9j_queries import _verified_and_clusters  # noqa: E402

SF = "/root/testdata/sf0.001"

P60 = 2147483647
COEFFS = [
    (387, 152), (1093, 901), (2251, 77), (3319, 409),
    (4447, 1279), (5561, 2069), (6673, 3167), (7793, 4021),
    (8887, 5279), (10007, 6151), (11113, 7013), (12227, 7919),
    (13337, 8837), (14461, 9733), (15569, 10627), (16693, 11549),
]


def _norm(text):
    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()


def _tokens(text):
    return [t for t in _norm(text).split(" ") if t]


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rhu(x, nd):
    s = 10 ** nd
    return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s


def _corpus():
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    corpus = [(int(r.doc_id), r.text) for r in docs.itertuples()]
    corpus += [
        (int(r.doc_id) + 100000, r.text) for r in docs.itertuples() if r.doc_id % 13 == 0
    ]
    corpus += [
        (int(r.doc_id) + 200000, r.text + " extra token tail")
        for r in docs.itertuples()
        if r.doc_id % 10 == 0
    ]
    return corpus


def _layer(d):
    return "near_layer" if d >= 200000 else ("exact_layer" if d >= 100000 else "base")


def test_cluster_histogram_and_bigstar_match_python(spark):
    _, clusters = _verified_and_clusters()
    sizes = Counter(clusters.values())
    got_h = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in Q.queries()["dedup_cluster_size_histogram"](spark, SF).collect()
    }
    hist = Counter(sizes.values())
    want_h = {sz: (n, sz * n) for sz, n in hist.items()}
    assert got_h == want_h

    got_b = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in Q.queries()["dedup_clusters_bigstar"](spark, SF).collect()
    }
    want_b = {d: (c, sizes[c], d == c) for d, c in clusters.items()}
    assert got_b == want_b


def test_crossdup_layer_matrix_matches_python(spark):
    got = {
        (r["layer_a"], r["layer_b"]): (r["n_pairs"], r["avg_jaccard"])
        for r in Q.queries()["crossdup_layer_matrix"](spark, SF).collect()
    }
    hsets = {}
    for did, text in _corpus():
        n = _norm(text)
        hsets[did] = {_h60(n[i : i + 5]) for i in range(max(len(n) - 4, 1))}
    inv = defaultdict(list)
    for d, ss in hsets.items():
        for s in ss:
            inv[s].append(d)
    inter = Counter()
    for docs_w in inv.values():
        docs_w = sorted(docs_w)
        for i, a in enumerate(docs_w):
            for b in docs_w[i + 1 :]:
                inter[(a, b)] += 1
    agg = defaultdict(list)
    for (a, b), c in inter.items():
        j = _rhu(c / (len(hsets[a]) + len(hsets[b]) - c), 4)
        if j >= 0.6:
            agg[(_layer(a), _layer(b))].append(j)
    want = {k: (len(v), _rhu(sum(v) / len(v), 4)) for k, v in agg.items()}
    assert set(got) == set(want)
    for k, (n, aj) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - aj) < 2e-4


def test_minhash_eval_matches_python(spark):
    got = Q.queries()["dedup_minhash_eval"](spark, SF).collect()[0]
    hsets, sigs = {}, {}
    for did, text in _corpus():
        if did % 4 != 0:
            continue
        n = _norm(text)
        xs = {_h60(n[i : i + 5]) % P60 for i in range(max(len(n) - 4, 1))}
        hsets[did] = xs
        sigs[did] = [min((a * x + b) % P60 for x in xs) for a, b in COEFFS]
    inv = defaultdict(list)
    for d, ss in hsets.items():
        for s in ss:
            inv[s].append(d)
    inter = Counter()
    for docs_w in inv.values():
        docs_w = sorted(docs_w)
        for i, a in enumerate(docs_w):
            for b in docs_w[i + 1 :]:
                inter[(a, b)] += 1
    truth = {
        (a, b)
        for (a, b), c in inter.items()
        if _rhu(c / (len(hsets[a]) + len(hsets[b]) - c), 4) >= 0.6
    }
    buckets = defaultdict(list)
    for did, sig in sigs.items():
        for band in range(4):
            key = ",".join(str(v) for v in sig[band * 4 : band * 4 + 4])
            buckets[(band, hashlib.md5(key.encode()).hexdigest())].append(did)
    cand = set()
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cand.add((a, b))
    hit = len(truth & cand)
    assert got["n_true"] == len(truth)
    assert got["n_candidates"] == len(cand)
    assert got["n_hit"] == hit
    assert abs(got["recall"] - hit / len(truth)) < 1e-4
    assert abs(got["precision"] - hit / len(cand)) < 1e-4


def test_cms_join_size_matches_python(spark):
    got = Q.queries()["cms_join_size_estimate"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    dots = []
    for j in range(4):
        cnt = Counter(
            _h60(f"{j}:{k}") % 256 for k in o.o_custkey
        )
        dots.append(sum(c * c for c in cnt.values()))
    est = min(dots)
    exact = sum(c * c for c in Counter(o.o_custkey).values())
    assert got["join_size_exact"] == exact
    assert got["join_size_est"] == est
    assert got["never_underestimates"] == (est >= exact)
    assert abs(got["blowup"] - est / exact) < 1e-4


def test_kmv_set_ops_matches_python(spark):
    got = Q.queries()["kmv_set_operations"](spark, SF).collect()[0]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ua = {
        _h60(str(u)) / 1152921504606846976.0
        for u in ev[ev.event_type == "click"].user_id.unique()
    }
    ub = {
        _h60(str(u)) / 1152921504606846976.0
        for u in ev[ev.event_type == "purchase"].user_id.unique()
    }
    merged = sorted(ua | ub)
    kept = merged[:64]
    n = len(kept)
    both = sum(1 for u in kept if u in ua and u in ub)
    est_union = float(n) if n < 64 else 63.0 / max(kept)
    est_inter = float(both) if n < 64 else both / n * est_union
    users = ev[ev.event_type.isin(["click", "purchase"])].groupby("user_id").event_type.agg(set)
    exact_union = len(users)
    exact_inter = sum(1 for s in users if {"click", "purchase"} <= s)
    assert got["n_kept"] == n
    assert abs(got["est_union"] - est_union) < 1e-3
    assert abs(got["est_intersection"] - est_inter) < 1e-3
    assert abs(got["jaccard_est"] - both / n) < 1e-3
    assert (got["exact_union"], got["exact_intersection"]) == (exact_union, exact_inter)


def test_knn_ivf_kmeans_matches_python(spark):
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in Q.queries()["knn_ivf_kmeans"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    rows = sorted(
        (int(r.vec_id), np.asarray(r.embedding, dtype=np.float32).astype(np.float64))
        for r in emb.itertuples()
    )
    cents = [[_rhu(float(x), 6) for x in v] for _, v in rows[:8]]
    assign = {}
    for _ in range(2):
        assign = {}
        for vid, v in rows:
            best = min(
                range(8),
                key=lambda c: (
                    _rhu(float(sum((x - y) ** 2 for x, y in zip(v, cents[c]))), 4),
                    c,
                ),
            )
            assign[vid] = best
        new = []
        for c in range(8):
            mem = [v for vid, v in rows if assign[vid] == c]
            if mem:
                new.append(
                    [
                        _rhu(
                            float(sum(math.floor(m[d] * 1e9 + 0.5) for m in mem))
                            / len(mem) / 1e9,
                            6,
                        )
                        for d in range(64)
                    ]
                )
            else:
                new.append(cents[c])
        cents = new
    vecs = dict(rows)
    norms = {k: math.sqrt(float(v @ v)) for k, v in vecs.items()}
    by_cell = defaultdict(list)
    for vid, c in assign.items():
        by_cell[c].append(vid)
    want = {}
    for q, c in assign.items():
        if q % 20 != 0:
            continue
        sims = sorted(
            (
                (-_rhu(float(vecs[q] @ vecs[x]) / (norms[q] * norms[x]), 6), x)
                for x in by_cell[c]
                if x != q
            )
        )[:5]
        for i, (ns, x) in enumerate(sims):
            # display cosine = 4-round of the RAW ratio (the engine no
            # longer re-rounds the 1e-6 ranking grid — double-rounding)
            raw = float(vecs[q] @ vecs[x]) / (norms[q] * norms[x])
            want[(q, i + 1)] = (x, _rhu(raw, 4))
    assert set(got) == set(want)
    for k, (x, cos) in want.items():
        assert got[k][0] == x and abs(got[k][1] - cos) < 2e-4


def test_exact_substrings_match_python(spark):
    got = {
        r["span"]: (r["n_docs"], r["n_occurrences"], r["first_doc"])
        for r in Q.queries()["dedup_exact_substrings"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    spans = defaultdict(lambda: [set(), 0, 1 << 62])
    for r in docs.itertuples():
        ts = _tokens(r.text)
        for i in range(len(ts) - 11):
            sp = " ".join(ts[i : i + 12])
            e = spans[sp]
            e[0].add(r.doc_id)
            e[1] += 1
            e[2] = min(e[2], r.doc_id)
    want = {
        sp: (len(ds), occ, fd)
        for sp, (ds, occ, fd) in spans.items()
        if len(ds) >= 2
    }
    assert got == want


def test_pivot_rollup_antijoin_match_pandas(spark):
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    got_p = {
        r["segment"]: (r["urgent"], r["high"], r["medium"], r["not_specified"], r["low"])
        for r in Q.queries()["pivot_priority_by_segment"](spark, SF).collect()
    }
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    for seg, g in j.groupby("c_mktsegment"):
        want = tuple(int((g.o_orderpriority == p).sum()) for p in prios)
        assert got_p[seg] == want

    n = pd.read_parquet(f"{SF}/nation.parquet")
    reg = pd.read_parquet(f"{SF}/region.parquet")
    jj = j.merge(n, left_on="c_nationkey", right_on="n_nationkey").merge(
        reg, left_on="n_regionkey", right_on="r_regionkey"
    )
    got_r = {
        (r["region"], r["nation"]): (r["n_orders"], r["revenue"])
        for r in Q.queries()["rollup_revenue_geo"](spark, SF).collect()
    }
    want_r = {}
    for (rn, nn), g in jj.groupby(["r_name", "n_name"]):
        want_r[(rn, nn)] = (len(g), g.o_totalprice.sum())
    for rn, g in jj.groupby("r_name"):
        want_r[(rn, "(all)")] = (len(g), g.o_totalprice.sum())
    want_r[("(all)", "(all)")] = (len(jj), jj.o_totalprice.sum())
    assert set(got_r) == set(want_r)
    for k, (cnt, rev) in want_r.items():
        assert got_r[k][0] == cnt and abs(got_r[k][1] - rev) < 1e-2

    got_a = {
        r["c_mktsegment"]: r["n"]
        for r in Q.queries()["customers_without_orders_antijoin"](spark, SF).collect()
    }
    od = pd.to_datetime(o.o_orderdate)
    active = set(o[(od >= "1996-01-01") & (od < "1996-07-01")].o_custkey)
    inactive = c[~c.c_custkey.isin(active)]
    want_a = inactive.groupby("c_mktsegment").size().to_dict()
    assert got_a == want_a
