"""Independent Python references, batch 11: the remaining dedup/ANN
primitives and the execution-strategy-equivalence queries — exact
content dedup, SimHash signatures + Hamming-band pairs, sign-bit
embedding near-dup pairs, brute-force kNN, salted agg/join (result must
equal the plain shape), pivot/rollup/cube, and the bloom semi-join."""

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


def test_dedup_exact_matches_python(spark):
    got = {
        r["content_hash"]: (r["canonical_id"], r["n_docs"])
        for r in Q.queries()["dedup_exact"](spark, SF).collect()
    }
    groups = defaultdict(list)
    for did, text in _corpus():
        groups[hashlib.md5(_norm(text).encode()).hexdigest()].append(did)
    want = {
        h: (min(ds), len(ds)) for h, ds in groups.items() if len(ds) > 1
    }
    assert got == want


def _simhash_sigs():
    sigs = {}
    for did, text in _corpus():
        bits = [0] * 32
        for t in _tokens(text):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for b in range(32):
                bits[b] += 1 if (h >> b) & 1 else -1
        sigs[did] = sum((1 << b) for b in range(32) if bits[b] > 0)
    return sigs


def test_simhash_signatures_and_pairs_match_python(spark):
    sigs = _simhash_sigs()
    got_sig = {
        r["id"]: r["simhash"]
        for r in Q.queries()["dedup_simhash_signatures"](spark, SF).collect()
    }
    assert got_sig == sigs
    got_pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in Q.queries()["dedup_simhash_pairs"](spark, SF).collect()
    }
    buckets = defaultdict(list)
    for did, s in sigs.items():
        for band in range(4):
            buckets[(band, (s >> (band * 8)) & 255)].append(did)
    want = {}
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                d = bin(sigs[a] ^ sigs[b]).count("1")
                if d <= 3:
                    want[(a, b)] = d
    assert got_pairs == want


def _emb_vecs():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    return {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        for r in emb.itertuples()
    }


def test_dedup_embedding_cosine_matches_python(spark):
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in Q.queries()["dedup_embedding_cosine"](spark, SF).collect()
    }
    base = _emb_vecs()
    vecs = dict(base)
    vecs.update({k + 100000: v for k, v in base.items() if k % 17 == 0})
    norms = {k: math.sqrt(float(v @ v)) for k, v in vecs.items()}
    buckets = defaultdict(list)
    for k, v in vecs.items():
        for band, off in ((0, 0), (1, 8)):
            cell = sum((1 << j) for j in range(8) if v[off + j] > 0)
            buckets[(band, cell)].append(k)
    want = {}
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                cos = _rhu(float(vecs[a] @ vecs[b]) / (norms[a] * norms[b]), 4)
                if cos >= 0.9:
                    want[(a, b)] = cos
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 2e-4


def test_knn_bruteforce_matches_python(spark):
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in Q.queries()["knn_bruteforce"](spark, SF).collect()
    }
    vecs = _emb_vecs()
    norms = {k: math.sqrt(float(v @ v)) for k, v in vecs.items()}
    ids = sorted(vecs)
    want = {}
    for q in ids:
        if q % 20 != 0:
            continue
        sims = sorted(
            (
                (-_rhu(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
                for c in ids
                if c != q
            )
        )[:5]
        for i, (ns, c) in enumerate(sims):
            # display cosine = 4-round of the RAW ratio (no double-round)
            raw = float(vecs[q] @ vecs[c]) / (norms[q] * norms[c])
            want[(q, i + 1)] = (c, _rhu(raw, 4))
    assert set(got) == set(want)
    for k, (c, cos) in want.items():
        assert got[k][0] == c and abs(got[k][1] - cos) < 2e-4


def test_salted_agg_matches_plain(spark):
    got = {
        r["o_orderpriority"]: (r["total"], r["n"])
        for r in Q.queries()["salted_agg_order_priority"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    for prio, g in o.groupby("o_orderpriority"):
        gg = got[prio]
        assert gg[1] == len(g)
        assert abs(gg[0] - g.o_totalprice.sum()) < 1e-2


def test_salted_join_matches_plain(spark):
    got = {
        r["s_nationkey"]: (r["revenue"], r["n"])
        for r in Q.queries()["salted_join_supplier_revenue"](spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")
    j = li.merge(sup, left_on="l_suppkey", right_on="s_suppkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    for nk, g in j.groupby("s_nationkey"):
        gg = got[nk]
        assert gg[1] == len(g)
        assert abs(gg[0] - g.rev.sum()) < 1e-2


def test_pivot_rollup_cube_match_pandas(spark):
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    rev = li.l_extendedprice * (1 - li.l_discount)
    li = li.assign(rev=rev)
    got_p = {
        r["l_returnflag"]: (r["rev_O"], r["rev_F"])
        for r in Q.queries()["pivot_revenue_by_status"](spark, SF).collect()
    }
    for flag, g in li.groupby("l_returnflag"):
        o = g[g.l_linestatus == "O"].rev.sum()
        f = g[g.l_linestatus == "F"].rev.sum()
        gg = got_p[flag]
        assert abs(gg[0] - o) < 1e-2 and abs(gg[1] - f) < 1e-2

    got_r = {
        (r["flag"], r["status"]): (r["sum_qty"], r["n"])
        for r in Q.queries()["rollup_returnflag_status"](spark, SF).collect()
    }
    want_r = {}
    for (fl, st), g in li.groupby(["l_returnflag", "l_linestatus"]):
        want_r[(fl, st)] = (g.l_quantity.sum(), len(g))
    for fl, g in li.groupby("l_returnflag"):
        want_r[(fl, "ALL")] = (g.l_quantity.sum(), len(g))
    want_r[("ALL", "ALL")] = (li.l_quantity.sum(), len(li))
    assert set(got_r) == set(want_r)
    for k, (q, n) in want_r.items():
        assert got_r[k][1] == n and abs(got_r[k][0] - q) < 1e-2

    got_c = {
        (r["flag"], r["status"]): (r["gid"], r["sum_qty"], r["n_rows"])
        for r in Q.queries()["cube_qty_by_flag_status"](spark, SF).collect()
    }
    want_c = dict(want_r)
    for st, g in li.groupby("l_linestatus"):
        want_c[("ALL", st)] = (g.l_quantity.sum(), len(g))
    assert set(got_c) == set(want_c)
    for k, (q, n) in want_c.items():
        assert got_c[k][2] == n and abs(got_c[k][1] - q) < 1e-2


def test_bloom_semi_join_matches_pandas(spark):
    got = sorted(
        (r["o_orderkey"], r["o_custkey"])
        for r in Q.queries()["bloom_semi_join_orders"](spark, SF).collect()
    )
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    rich = set(c[c.c_acctbal > 7500.0].c_custkey)
    want = sorted(
        (int(r.o_orderkey), int(r.o_custkey))
        for r in o.itertuples()
        if r.o_custkey in rich
    )
    assert got == want
