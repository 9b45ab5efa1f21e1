"""Independent Python/pandas/numpy references, batch 4: retrieval and
encoding — HITS power iteration, Sinkhorn balancing, Naive Bayes
confusion, out-of-fold target encoding, label-based retrieval metrics,
BM25+Jaccard RRF fusion, greedy MMR, DSIR importance weights, ordered
funnel, 3-D Pareto skyline, CEP sequence patterns, URL parsing and
canonicalization."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict
from datetime import timedelta

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


def test_hits_matches_python(spark):
    got = {
        (r["id"], r["role"]): r["score"]
        for r in Q.queries()["hits_customer_supplier"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    e = sorted(set(zip(j.o_custkey, j.l_suppkey)))
    U = 100000000
    h = {c: U for c, _ in e}
    a = {}
    for _ in range(4):
        raw = defaultdict(int)
        for c, s in e:
            raw[s] += h[c]
        mx = max(raw.values())
        a = {k: int(math.floor(v / mx * U + 0.5)) for k, v in raw.items()}
        raw = defaultdict(int)
        for c, s in e:
            raw[c] += a[s]
        mx = max(raw.values())
        h = {k: int(math.floor(v / mx * U + 0.5)) for k, v in raw.items()}
    want = {(k, "hub"): v / U for k, v in h.items()}
    want.update({(k, "authority"): v / U for k, v in a.items()})
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-8, k


def test_sinkhorn_matches_python(spark):
    got = {
        (r["prev_type"], r["next_type"]): (r["p_ds"], r["row_sum"], r["col_sum"])
        for r in Q.queries()["sinkhorn_transition_matrix"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    m = Counter()
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))
        for a, b in zip(rows, rows[1:]):
            m[(a.event_type, b.event_type)] += 1
    v = {k: float(c) for k, c in m.items()}
    for _ in range(4):
        rs = defaultdict(float)
        for (p, n), x in v.items():
            rs[p] += x
        v = {k: _rhu(x / rs[k[0]], 8) for k, x in v.items()}
        cs = defaultdict(float)
        for (p, n), x in v.items():
            cs[n] += x
        v = {k: _rhu(x / cs[k[1]], 8) for k, x in v.items()}
    rs = defaultdict(float)
    cs = defaultdict(float)
    for (p, n), x in v.items():
        rs[p] += x
        cs[n] += x
    assert set(got) == set(v)
    for k, x in v.items():
        g = got[k]
        assert abs(g[0] - x) < 1e-7
        assert abs(g[1] - rs[k[0]]) < 1e-5
        assert abs(g[2] - cs[k[1]]) < 1e-5


def test_nb_lang_confusion_matches_python(spark):
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in Q.queries()["nb_lang_confusion"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    lang_of = dict(zip(docs.doc_id, docs.lang))
    langs = sorted(docs.lang.unique())
    ndocs = len(docs)
    lprior = {
        l: _rhu(math.log((docs.lang == l).sum() / ndocs), 8) for l in langs
    }
    cnt = defaultdict(Counter)
    for did, ts in toks.items():
        cnt[lang_of[did]].update(ts)
    ctot = {l: sum(c.values()) for l, c in cnt.items()}
    vocab = len({t for c in cnt.values() for t in c})
    lp = {
        (l, t): _rhu(math.log((c + 1.0) / (ctot[l] + vocab)), 8)
        for l, cc in cnt.items()
        for t, c in cc.items()
    }
    lp0 = {l: _rhu(math.log(1.0 / (ctot[l] + vocab)), 8) for l in langs}
    conf = Counter()
    for did, ts in toks.items():
        best = None
        for cand in langs:
            score = _rhu(
                lprior[cand] + sum(lp.get((cand, t), lp0[cand]) for t in ts), 4
            )
            if best is None or (-score, cand) < best[0]:
                best = ((-score, cand), cand)
        conf[(lang_of[did], best[1])] += 1
    assert got == dict(conf)


def test_target_encode_matches_python(spark):
    got = {
        (r["cat"], r["fold"]): (r["n"], r["te"])
        for r in Q.queries()["target_encode_mktsegment"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["fold"] = j.o_orderkey % 5
    j["y"] = (j.o_orderpriority == "1-URGENT").astype(int)
    per = j.groupby(["c_mktsegment", "fold"]).y.agg(["size", "sum"])
    tot = j.groupby("c_mktsegment").y.agg(["size", "sum"])
    assert set(got) == set(per.index)
    for (cat, fold), row in per.iterrows():
        nt, st = tot.loc[cat]
        te = (st - row["sum"] + 20.0 * 0.2) / (nt - row["size"] + 20.0)
        g = got[(cat, fold)]
        assert g[0] == row["size"]
        assert abs(g[1] - te) < 1e-5


def _emb():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    return {
        r.vec_id: np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        for r in emb.itertuples()
    }, dict(zip(emb.vec_id, emb.label))


def test_retrieval_eval_matches_python(spark):
    got = {
        r["query_id"]: (
            r["query_label"], r["n_relevant"], r["hits_at_k"],
            r["rr_at_k"], r["recall_at_k"], r["ndcg_at_k"],
        )
        for r in Q.queries()["retrieval_eval_embeddings"](spark, SF).collect()
    }
    vecs, labels = _emb()
    norms = {k: float(np.sqrt((v * v).sum())) for k, v in vecs.items()}
    ids = sorted(vecs)
    for q in ids:
        if q % 20 != 0:
            continue
        sims = sorted(
            (
                (-_rhu(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
                for c in ids
                if c != q
            )
        )
        ql = labels[q]
        rel_ranks = [
            i + 1 for i, (_, c) in enumerate(sims) if labels[c] == ql
        ]
        n_rel = len(rel_ranks)
        hits = sum(1 for r in rel_ranks if r <= 10)
        rr = 1.0 / rel_ranks[0] if rel_ranks and rel_ranks[0] <= 10 else 0.0
        dcg = sum(1.0 / math.log2(r + 1.0) for r in rel_ranks if r <= 10)
        ideal = min(n_rel, 10)
        idcg = sum(1.0 / math.log2(i + 1.0) for i in range(1, ideal + 1))
        ndcg = dcg / idcg if idcg > 0 else 0.0
        g = got[q]
        assert g[0] == ql and g[1] == n_rel and g[2] == hits, q
        assert abs(g[3] - rr) < 1e-4 and abs(g[4] - (hits / n_rel if n_rel else 0.0)) < 1e-4
        assert abs(g[5] - ndcg) < 1e-4, q


def _bm25_jaccard_top20():
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    tf = {r.doc_id: Counter(_tokens(r.text)) for r in docs.itertuples()}
    tf = {d: c for d, c in tf.items() if c}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = len(tf)
    avgdl = sum(dl.values()) / n
    kept = {t for t, d in df.items() if d * 1000 <= 900 * n}
    inv = defaultdict(list)
    for d, c in tf.items():
        for t in c:
            inv[t].append(d)
    b20, j20 = {}, {}
    for q in tf:
        if q % 97 != 0:
            continue
        qtoks = [t for t in tf[q] if t in kept]
        scores = defaultdict(float)
        for t in qtoks:
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            for d in inv[t]:
                if d == q:
                    continue
                f = tf[d][t]
                scores[d] += idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl[d] / avgdl))
        ranked = sorted(
            ((-_rhu(s, 4), d) for d, s in scores.items())
        )[:20]
        b20[q] = {d: i + 1 for i, (_, d) in enumerate(ranked)}
        sets = {d: set(c) for d, c in tf.items()}
        js = {}
        for d, s in sets.items():
            if d == q:
                continue
            inter = len(sets[q] & s)
            if inter:
                js[d] = _rhu(inter / (len(sets[q]) + len(s) - inter), 6)
        ranked = sorted(((-v, d) for d, v in js.items()))[:20]
        j20[q] = {d: i + 1 for i, (_, d) in enumerate(ranked)}
    return b20, j20


def test_hybrid_rrf_matches_python(spark):
    got = {
        (r["query_id"], r["doc_id"]): (
            r["rank"], r["rrf_score"], r["bm25_rank"], r["jaccard_rank"]
        )
        for r in Q.queries()["hybrid_rrf_retrieval"](spark, SF).collect()
    }
    b20, j20 = _bm25_jaccard_top20()
    want = {}
    for q in b20:
        fused = defaultdict(float)
        for d, r in b20[q].items():
            fused[d] += 1.0 / (60 + r)
        for d, r in j20[q].items():
            fused[d] += 1.0 / (60 + r)
        ranked = sorted(((-_rhu(s, 6), d) for d, s in fused.items()))[:5]
        for i, (ns, d) in enumerate(ranked):
            want[(q, d)] = (i + 1, -ns, b20[q].get(d, 0), j20[q].get(d, 0))
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3], k
        assert abs(g[1] - w[1]) < 1e-5, k


def test_mmr_matches_python(spark):
    got = {
        (r["query_id"], r["pick_order"]): (r["doc_id"], r["mmr_score"])
        for r in Q.queries()["mmr_diversified_retrieval"](spark, SF).collect()
    }
    vecs, _ = _emb()
    norms = {k: float(np.sqrt((v * v).sum())) for k, v in vecs.items()}
    ids = sorted(vecs)

    def sim_i(a, b):
        return int(
            round(_rhu(float(vecs[a] @ vecs[b]) / (norms[a] * norms[b]), 6) * 1000000)
        )

    want = {}
    for q in ids:
        if q % 50 != 0:
            continue
        cand = sorted(((-sim_i(q, c), c) for c in ids if c != q))[:10]
        cand = [(c, -ns) for ns, c in cand]  # (doc, rel_i) by rel desc, doc asc
        sel = []
        rel = dict(cand)
        first = max(cand, key=lambda t: (t[1], -t[0]))
        # tie-break rel desc then doc asc: cand is already sorted that way
        first = cand[0]
        sel.append((first[0], 7 * first[1]))
        while len(sel) < 4:
            best = None
            for c, r in cand:
                if any(c == s for s, _ in sel):
                    continue
                mx = max(sim_i(c, s) for s, _ in sel)
                score = 7 * r - 3 * mx
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            sel.append((best[1], best[2]))
        for i, (d, s) in enumerate(sel):
            want[(q, i + 1)] = (d, s / 1e7)
    assert set(got) == set(want)
    for k, (d, s) in want.items():
        g = got[k]
        assert g[0] == d, k
        assert abs(g[1] - s) < 1e-7, k


def test_dsir_matches_python(spark):
    got = {
        r["doc_id"]: (r["n_tokens"], r["logratio"])
        for r in Q.queries()["dsir_importance_weights"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    raw = Counter()
    tgt = Counter()
    for r in docs.itertuples():
        raw.update(toks[r.doc_id])
        if r.lang == "en":
            tgt.update(toks[r.doc_id])
    tot_raw = sum(raw.values())
    tot_tgt = sum(tgt[t] for t in raw)
    vocab = len(raw)
    lr = {
        t: math.log2((tgt.get(t, 0) + 1) / (tot_tgt + vocab))
        - math.log2((raw[t] + 1) / (tot_raw + vocab))
        for t in raw
    }
    for did, ts in toks.items():
        if not ts:
            assert did not in got
            continue
        g = got[did]
        assert g[0] == len(ts)
        assert abs(g[1] - sum(lr[t] for t in ts) / len(ts)) < 2e-4, did


def test_funnel_conversion_matches_python(spark):
    got = {
        r["step"]: r["n_users"]
        for r in Q.queries()["events_funnel_conversion"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    by = {
        et: defaultdict(list)
        for et in ("view", "click", "purchase")
    }
    for r in ev.itertuples():
        if r.event_type in by:
            by[r.event_type][r.user_id].append(r.ts)
    H2 = timedelta(hours=2)
    s1 = set(by["view"])
    s2, s3 = set(), set()
    for u in s1:
        vc = [
            (v, c)
            for v in by["view"][u]
            for c in by["click"].get(u, ())
            if v < c <= v + H2
        ]
        if vc:
            s2.add(u)
            if any(
                c < p <= c + H2
                for _, c in vc
                for p in by["purchase"].get(u, ())
            ):
                s3.add(u)
    assert got == {
        "view": len(s1), "view>click": len(s2), "view>click>purchase": len(s3)
    }


def test_pareto_3d_matches_python(spark):
    got = sorted(
        (r["suppkey"], r["avg_cost"], r["avg_delay"], r["return_rate"])
        for r in Q.queries()["pareto_frontier_3d"](spark, SF).collect()
    )
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_orderdate"]]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["cost"] = j.l_extendedprice * (1 - j.l_discount)
    j["delay"] = (
        pd.to_datetime(j.l_shipdate) - pd.to_datetime(j.o_orderdate)
    ).dt.days
    j["ret"] = (j.l_returnflag == "R").astype(float)
    s = j.groupby("l_suppkey").agg(
        avg_cost=("cost", "mean"), avg_delay=("delay", "mean"), ret=("ret", "mean")
    )
    pts = {
        k: (_rhu(r.avg_cost, 4), _rhu(r.avg_delay, 4), _rhu(r.ret, 4))
        for k, r in s.iterrows()
    }
    want = []
    for k, p in pts.items():
        dominated = any(
            q[0] <= p[0] and q[1] <= p[1] and q[2] <= p[2] and q != p
            for q in pts.values()
        )
        # strict definition: some q <= p componentwise with at least one strict
        dominated = any(
            all(qc <= pc for qc, pc in zip(q, p)) and any(qc < pc for qc, pc in zip(q, p))
            for kk, q in pts.items()
            if kk != k
        )
        if not dominated:
            want.append((k, *p))
    want.sort()
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        for gv, wv in zip(g[1:], w[1:]):
            assert abs(gv - wv) < 2e-4, g


def test_sequence_pattern_matches_python(spark):
    got = {
        r["pattern"]: (r["n_matched"], r["n_users"], r["pct"])
        for r in Q.queries()["sequence_pattern_match"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    c1 = c2 = c3 = 0
    n_users = ev.user_id.nunique()
    for uid, g in ev.groupby("user_id"):
        seq = "".join(
            r.event_type[0]
            for r in sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))
        )
        c1 += bool(re.search("eee", seq))
        c2 += bool(re.search("v.*c.*p", seq))
        c3 += bool(re.match("s", seq))
    for pat, c in (("triple_error", c1), ("conversion_path", c2), ("signup_first", c3)):
        g = got[pat]
        assert g[0] == c and g[1] == n_users
        assert abs(g[2] - c / n_users) < 1e-4


def test_url_host_stats_matches_python(spark):
    got = {
        r["host"]: (r["domain"], r["n_docs"], r["n_langs"], r["min_path"], r["avg_chars"])
        for r in Q.queries()["url_host_stats"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    for src, g in docs.groupby("source"):
        host = f"{src}.example.org"
        gh = got[host]
        assert gh[0] == "example.org"
        assert gh[1] == len(g)
        assert gh[2] == g.lang.nunique()
        assert gh[3] == min(f"/docs/{d}" for d in g.doc_id)
        assert abs(gh[4] - g.n_chars.mean()) < 1e-3


def test_url_canonical_dedup_matches_python(spark):
    got = {
        r["canonical_url"]: (r["n_docs"], r["canonical_doc"])
        for r in Q.queries()["url_canonical_dedup"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    groups = defaultdict(list)
    for d in docs.doc_id:
        rid = d // 2
        groups[f"https://www.example.org/docs/{rid}?id={rid}"].append(d)
    want = {
        u: (len(ds), min(ds)) for u, ds in groups.items() if len(ds) > 1
    }
    assert got == want
