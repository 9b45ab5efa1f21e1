"""Independent Python references, batch 6: the iterative factorization
and graph queries — exact-integer ALS half-steps (+ top-k recommend),
label propagation communities, multi-source BFS reach, and HyperBall
neighborhood estimation with md5 HLL registers."""

import hashlib
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


def _ratings():
    o = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey", "l_extendedprice"]
    ]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    cents = defaultdict(int)
    for r in j.itertuples():
        cents[(r.o_custkey, r.l_suppkey)] += _rnd(r.l_extendedprice * 100)
    return {
        k: _rnd(math.log(1.0 + v / 100.0) * 1000000) for k, v in cents.items()
    }


def _als_half(r_items, lam=100000000000):
    out = {}
    for k, rows in r_items.items():
        s11 = s12 = s22 = b1 = b2 = 0
        for rv, (fx, fy) in rows:
            s11 += fx * fx
            s12 += fx * fy
            s22 += fy * fy
            b1 += rv * fx
            b2 += rv * fy
        a11, a22, a12 = float(s11 + lam), float(s22 + lam), float(s12)
        det = a11 * a22 - a12 * a12
        out[k] = (
            _rnd((a22 * b1 - a12 * b2) / det * 1000000),
            _rnd((a11 * b2 - a12 * b1) / det * 1000000),
        )
    return out


def _als_factors():
    r = _ratings()
    v0 = {
        s: (_rnd((1.0 + (s % 7) / 10.0) * 1000000), _rnd((1.0 - (s % 5) / 10.0) * 1000000))
        for s in {s for _, s in r}
    }
    by_c = defaultdict(list)
    for (c, s), rv in r.items():
        by_c[c].append((rv, v0[s]))
    u1 = _als_half(by_c)
    by_s = defaultdict(list)
    for (c, s), rv in r.items():
        by_s[s].append((rv, u1[c]))
    v1 = _als_half(by_s)
    return r, u1, v1


def test_als_factors_match_python(spark):
    got = {
        (r["id"], r["role"]): (r["fx_micro"], r["fy_micro"])
        for r in Q.queries()["als_factors_retail"](spark, SF).collect()
    }
    _, u1, v1 = _als_factors()
    want = {(k, "user"): v for k, v in u1.items()}
    want.update({(k, "item"): v for k, v in v1.items()})
    assert got == want


def test_als_recommend_matches_python(spark):
    got = {
        (r["c"], r["rk"]): (r["s"], r["score_micro2"])
        for r in Q.queries()["als_recommend_topk"](spark, SF).collect()
    }
    r, u1, v1 = _als_factors()
    seen = defaultdict(set)
    for (c, s) in r:
        seen[c].add(s)
    want = {}
    for c, (ufx, ufy) in u1.items():
        if c % 100 != 0:
            continue
        scored = sorted(
            (
                (-(ufx * fx + ufy * fy), s)
                for s, (fx, fy) in v1.items()
                if s not in seen[c]
            )
        )[:3]
        for i, (ns, s) in enumerate(scored):
            want[(c, i + 1)] = (s, -ns)
    assert got == want


def _edge_cut(denom):
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
    total = len(sup)
    ranked = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))
    keep = ranked[: math.ceil(total / denom)]
    und = defaultdict(set)
    for (u, v), _ in keep:
        und[u].add(v)
        und[v].add(u)
    return und


def test_communities_lpa_matches_python(spark):
    got = [
        (r["community"], r["n_members"], r["min_member"], r["rank"])
        for r in Q.queries()["communities_suppliers"](spark, SF).collect()
    ]
    und = _edge_cut(100)
    lab = {n: n for n in und}
    for _ in range(3):
        new = {}
        for n in und:
            w = Counter(lab[m] for m in und[n])
            new[n] = min(w.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    sized = defaultdict(list)
    for n, c in lab.items():
        sized[c].append(n)
    rows = sorted(
        ((c, len(ms), min(ms)) for c, ms in sized.items()),
        key=lambda t: (-t[1], t[0]),
    )
    want = [(c, n, m, i + 1) for i, (c, n, m) in enumerate(rows[:10])]
    assert got == want


def test_graph_reach_hubs_matches_python(spark):
    got = {
        (r["seed"], r["radius"]): r["n_new"]
        for r in Q.queries()["graph_reach_hubs"](spark, SF).collect()
    }
    und = _edge_cut(10)
    deg = sorted(((len(v), n) for n, v in und.items()), key=lambda t: (-t[0], t[1]))
    hubs = [n for _, n in deg[:10]]
    want = {}
    for seed in hubs:
        visited = {seed}
        frontier = {seed}
        for radius in (1, 2, 3):
            nxt = {m for f in frontier for m in und[f]} - visited
            if nxt:  # empty frontiers emit no group-by row
                want[(seed, radius)] = len(nxt)
            visited |= nxt
            frontier = nxt
    assert got == want


def test_hyperball_matches_python(spark):
    got = {
        r["radius"]: (r["n_nodes"], r["est_reach"])
        for r in Q.queries()["graph_hyperball_suppliers"](spark, SF).collect()
    }
    und = _edge_cut(10)
    M = 64
    WB = 55  # 60 - b + 1 with b = 6 bucket bits
    regs = {}
    for n in und:
        h = int(hashlib.md5(str(n).encode()).hexdigest()[:15], 16)
        w = h >> 6
        reg = WB if w == 0 else WB - w.bit_length()
        regs[n] = {h % M: reg}

    def est(rg):
        z = sum(2.0 ** -r for r in rg.values()) + (M - len(rg))
        v = float(M - len(rg))
        alpha = 0.7213 / (1.0 + 1.079 / M)
        raw = alpha * M * M / z
        if raw <= 2.5 * M and v > 0:
            return float(M) * math.log(float(M) / v)
        return raw

    for radius in range(4):
        total = sum(round(est(rg), 4) for rg in regs.values())
        g = got[radius]
        assert g[0] == len(regs)
        assert abs(g[1] - total) < 1e-2, radius
        new = {}
        for n, rg in regs.items():
            merged = dict(rg)
            for m in und[n]:
                for b, r in regs[m].items():
                    if merged.get(b, -1) < r:
                        merged[b] = r
            new[n] = merged
        regs = new
