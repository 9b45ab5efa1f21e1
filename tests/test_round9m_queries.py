"""Independent Python references, batch 13: the iterative graph catalog
queries on the REAL trade/co-supply graphs — integer-grid PageRank and
personalized PageRank, bounded Bellman-Ford, triangle membership and
clustering coefficients, the support-percolation sweep, and the k-core
peel. The operators already carry randomized small-graph references;
these pin the full catalog compositions (edge construction + operator +
report) end to end."""

import math
import os
import sys
from collections import Counter, defaultdict

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rnd(x):
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _co_supply():
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    per_order = defaultdict(set)
    for r in li.itertuples():
        per_order[r.l_orderkey].add(int(r.l_suppkey))
    sup = Counter()
    for ss in per_order.values():
        ss = sorted(ss)
        for i, u in enumerate(ss):
            for v in ss[i + 1 :]:
                sup[(u, v)] += 1
    return sup


def _cust_supp_pairs(tag):
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    if tag == "offset":
        return sorted({(int(c), int(s) + 1000000) for c, s in zip(j.o_custkey, j.l_suppkey)})
    return sorted({(2 * int(c), 2 * int(s) + 1) for c, s in zip(j.o_custkey, j.l_suppkey)})


def _pagerank(edges, seeds=None, iterations=10):
    U = 10**8
    reset_n = int(round(0.15 * U))
    outdeg = Counter(u for u, _ in edges)
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    rn = {
        n: (reset_n if (seeds is None or n in seeds) else 0) for n in nodes
    }
    sn = {
        n: (U if (seeds is None or n in seeds) else 0) for n in nodes
    }
    for _ in range(iterations):
        contrib = defaultdict(int)
        for u, v in edges:
            contrib[v] += _rnd(sn[u] / outdeg[u])
        sn = {n: rn[n] + _rnd(0.85 * contrib.get(n, 0)) for n in nodes}
    return {n: s / U for n, s in sn.items()}


def test_pagerank_catalog_matches_python(spark):
    got = {
        r["id"]: r["score"]
        for r in Q.queries()["pagerank_customer_supplier"](spark, SF).collect()
    }
    pairs = _cust_supp_pairs("offset")
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    want = _pagerank(edges)
    assert got == want


def test_ppr_catalog_matches_python(spark):
    got = {
        r["id"]: r["score"]
        for r in Q.queries()["ppr_seeded_customers"](spark, SF).collect()
    }
    pairs = _cust_supp_pairs("parity")
    edges = [(c, s) for c, s in pairs] + [(s, c) for c, s in pairs]
    seeds = {c for c, _ in pairs if c % 200 == 0}
    want = {n: s for n, s in _pagerank(edges, seeds=seeds).items() if s > 0}
    assert got == want


def test_sssp_catalog_matches_python(spark):
    got = {
        (r["src_id"], r["node"]): r["dist"]
        for r in Q.queries()["sssp_hub_suppliers"](spark, SF).collect()
    }
    sup = _co_supply()
    und = defaultdict(list)
    for (u, v), n in sup.items():
        w = max(1, 9 - n)
        und[u].append((v, w))
        und[v].append((u, w))
    deg = sorted(((len(v), n) for n, v in und.items()), key=lambda t: (-t[0], t[1]))
    hubs = [n for _, n in deg[:3]]
    want = {}
    for seed in hubs:
        dist = {seed: 0}
        for _ in range(4):
            nd = dict(dist)
            for a, d in dist.items():
                for b, w in und[a]:
                    if d + w < nd.get(b, 1 << 60):
                        nd[b] = d + w
            dist = nd
        for n, d in dist.items():
            want[(seed, n)] = d
    assert got == want


def _triangles(edges):
    """Per-node oriented triangle membership over a u<v edge set."""
    eset = set(edges)
    nbrs = defaultdict(list)
    for u, v in edges:
        nbrs[u].append(v)
    tcnt = Counter()
    for a in nbrs:
        na = sorted(nbrs[a])
        for i, b in enumerate(na):
            for c in nbrs.get(b, ()):
                if (a, c) in eset:
                    tcnt[a] += 1
                    tcnt[b] += 1
                    tcnt[c] += 1
    return tcnt


def test_supplier_triangles_match_python(spark):
    got = [
        (r["suppkey"], r["n_triangles"], r["rank"])
        for r in Q.queries()["supplier_triangles"](spark, SF).collect()
    ]
    edges = [e for e, n in _co_supply().items() if n >= 5]
    tcnt = _triangles(edges)
    ranked = sorted(tcnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [(k, n, i + 1) for i, (k, n) in enumerate(ranked)]
    assert got == want


def test_clustering_coeff_matches_python(spark):
    got = [
        (r["suppkey"], r["degree"], r["n_triangles"], r["coef"], r["rank"])
        for r in Q.queries()["clustering_coeff_suppliers"](spark, SF).collect()
    ]
    edges = [e for e, n in _co_supply().items() if n >= 5]
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    tcnt = _triangles(edges)
    rows = []
    for n, d in deg.items():
        if d < 2:
            continue
        t = tcnt.get(n, 0)
        coef = _rnd(2 * t / (d * (d - 1)) * 1e6) / 1e6
        rows.append((coef, d, n, t))
    rows.sort(key=lambda r: (-r[0], -r[1], r[2]))
    want = [
        (n, d, t, coef, i + 1) for i, (coef, d, n, t) in enumerate(rows[:10])
    ]
    assert [(g[0], g[1], g[2], g[4]) for g in got] == [
        (w[0], w[1], w[2], w[4]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[3] - w[3]) < 2e-6


def test_percolation_matches_python(spark):
    got = {
        r["support_pctile"]: (
            r["threshold"], r["n_nodes"], r["n_edges"], r["giant_size"], r["giant_frac"]
        )
        for r in Q.queries()["graph_percolation_supplier"](spark, SF).collect()
    }
    sup = _co_supply()
    n_e = len(sup)
    hist = Counter(sup.values())
    for q in (50, 90, 99):
        cum = 0
        t = None
        for c in sorted(hist):
            cum += hist[c]
            if cum * 100 >= q * n_e:
                t = c
                break
        edges = [e for e, n in sup.items() if n >= t]
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        seen = set()
        comps = []
        for n0 in adj:
            if n0 in seen:
                continue
            comp, stack = 0, [n0]
            seen.add(n0)
            while stack:
                x = stack.pop()
                comp += 1
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            comps.append(comp)
        n_nodes = sum(comps)
        giant = max(comps) if comps else 0
        g = got[q]
        assert g[0] == t and g[1] == n_nodes and g[2] == len(edges)
        assert g[3] == giant
        assert abs(g[4] - giant / max(n_nodes, 1)) < 1e-4


def test_kcore_matches_python(spark):
    got = {
        r["suppkey"]: r["peel_round"]
        for r in Q.queries()["graph_kcore_suppliers"](spark, SF).collect()
    }
    sup = _co_supply()
    ranked = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = ranked[: math.ceil(len(sup) / 10)]
    adj = defaultdict(set)
    for (u, v), _ in keep:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    want = {}
    for t in range(1, 9):
        degs = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
        peeled = {n for n, d in degs.items() if d < 3}
        for n in peeled:
            want[n] = t
        alive -= peeled
        if not peeled:
            break
    for n in alive:
        want[n] = 0
    assert got == want
