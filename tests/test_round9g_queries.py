"""Independent Python references, batch 7: the deterministic-randomness
family — hash-draw random walks and their PMI statistics, grid DBSCAN
with integer eps tests, prefix-doubling suffix ranks, the hashing-trick
featurizer, and the md5-sign Johnson-Lindenstrauss projection."""

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


def _norm(text):
    return re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()


def _tokens(text):
    return [t for t in _norm(text).split(" ") if t]


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rnd(x):
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _walks():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    per_order = defaultdict(set)
    for r in li.itertuples():
        per_order[r.l_orderkey].add(r.l_suppkey)
    sup = Counter()
    for ss in per_order.values():
        ss = sorted(ss)
        for i, u in enumerate(ss):
            for v in ss[i + 1 :]:
                sup[(u, v)] += 1
    und = defaultdict(set)
    for (u, v), n in sup.items():
        if n >= 5:
            und[u].add(v)
            und[v].add(u)
    adj = {}
    for src, dsts in und.items():
        ranked = sorted(
            dsts, key=lambda d: (hashlib.md5(f"walk-cap-{src}-{d}".encode()).hexdigest(), d)
        )[:64]
        adj[src] = sorted(ranked)
    walks = {}
    for start in adj:
        path = [start]
        for t in range(1, 6):
            nbrs = adj[path[-1]]
            path.append(nbrs[_h60(f"walk-{start}-{t}") % len(nbrs)])
        walks[start] = path
    return walks


def test_random_walks_match_python(spark):
    got = {
        r["walk_id"]: r["path"]
        for r in Q.queries()["graph_random_walks"](spark, SF).collect()
    }
    want = {w: "-".join(str(n) for n in p) for w, p in _walks().items()}
    assert got == want


def test_walk_cooccurrence_pmi_matches_python(spark):
    got = [
        (r["u"], r["v"], r["n_cooccur"], r["pmi"], r["rank"])
        for r in Q.queries()["walk_cooccurrence_pmi"](spark, SF).collect()
    ]
    walks = _walks()
    co = Counter()
    occ = Counter()
    for path in walks.values():
        occ.update(path)
        for i, a in enumerate(path):
            for j in (1, 2):
                if i + j < len(path):
                    b = path[i + j]
                    if a != b:
                        co[(min(a, b), max(a, b))] += 1
    npos = sum(occ.values())
    scored = [
        (u, v, c, _rnd(math.log(c * npos / (occ[u] * occ[v])) * 10000) / 10000)
        for (u, v), c in co.items()
        if c >= 3
    ]
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = [(u, v, c, p, i + 1) for i, (u, v, c, p) in enumerate(scored[:20])]
    assert [(g[0], g[1], g[2], g[4]) for g in got] == [
        (w[0], w[1], w[2], w[4]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 1.1e-4


def test_dbscan_grid_matches_python(spark):
    got = {
        r["vec_id"]: (r["cluster_id"], r["role"])
        for r in Q.queries()["dbscan_embeddings_grid"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    pts = {}
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        qx = _rnd(float(v.sum()) / 8 * 1000)
        qy = _rnd(float((v * np.array([1.0 if i % 2 == 0 else -1.0 for i in range(64)])).sum()) / 8 * 1000)
        pts[r.vec_id] = (qx, qy)
    ids = sorted(pts)
    nb = defaultdict(set)
    for i, a in enumerate(ids):
        ax, ay = pts[a]
        for b in ids[i + 1 :]:
            bx, by = pts[b]
            if (ax - bx) ** 2 + (ay - by) ** 2 <= 400:
                nb[a].add(b)
                nb[b].add(a)
    cores = {i for i in ids if len(nb[i]) + 1 >= 5}
    # components over core-core edges, labeled by min member
    cluster = {}
    for c in sorted(cores):
        if c in cluster:
            continue
        comp, stack = [], [c]
        seen = {c}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in nb[x]:
                if y in cores and y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            cluster[x] = m
    want = {}
    for i in ids:
        if i in cores:
            want[i] = (cluster[i], "core")
        else:
            core_nbrs = [cluster[x] for x in nb[i] if x in cores]
            if core_nbrs:
                want[i] = (min(core_nbrs), "border")
            else:
                want[i] = (-1, "noise")
    assert got == want


def test_suffix_ranks_match_python(spark):
    got = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in Q.queries()["suffix_ranks_corpus"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = []
    for r in docs.itertuples():
        if r.doc_id % 10 != 0:
            continue
        s = _norm(r.text)[:160]
        for pos in range(1, len(s) + 1):
            rows.append((s[pos - 1 : pos + 31], r.doc_id, pos))
    ranks = {w: i + 1 for i, w in enumerate(sorted({w for w, _, _ in rows}))}
    want = {(d, p): ranks[w] for w, d, p in rows}
    assert got == want


def test_feature_hash_tf_matches_python(spark):
    got = {
        (r["doc_id"], r["bucket"]): r["tf"]
        for r in Q.queries()["feature_hash_tf"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = Counter()
    for r in docs.itertuples():
        for t in _tokens(r.text):
            want[(r.doc_id, _h60(t) % 64)] += 1
    assert got == dict(want)


def test_random_projection_matches_python(spark):
    got = {
        r["vec_id"]: tuple(r[f"rp_{k}"] for k in range(4))
        for r in Q.queries()["embedding_random_projection"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    signs = {
        (k, d): 1.0
        if int(hashlib.md5(f"rp-{k}-{d}".encode()).hexdigest()[0], 16) % 2 == 0
        else -1.0
        for k in range(4)
        for d in range(64)
    }
    for r in emb.itertuples():
        v = np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        for k in range(4):
            acc = 0.0
            for d in range(64):  # same left-to-right fold as both engines
                acc = acc + float(v[d]) * signs[(k, d)]
            assert abs(got[r.vec_id][k] - acc / 8.0) < 2e-6, (r.vec_id, k)
