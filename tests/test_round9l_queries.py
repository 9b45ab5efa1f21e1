"""Independent Python references, batch 12: the remaining dedup grains —
passage-level segment dedup, directional 12-gram containment, the
exact-Jaccard pair report over the real corpus, the uncapped MinHash
candidate pairs, and the Zipf slope fit."""

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


def test_dedup_passages_matches_python(spark):
    got = {
        r["id"]: (
            r["n_segments"], r["n_shared_segments"], r["shared_fraction"],
            r["n_tokens"], r["n_kept_tokens"],
        )
        for r in Q.queries()["dedup_passages"](spark, SF).collect()
    }
    segs = {}
    owners = defaultdict(lambda: [1 << 62, set()])
    for did, text in _corpus():
        ts = text.split(" ")
        n_seg = math.ceil(len(ts) / 10.0)
        rows = []
        for i in range(n_seg):
            seg = ts[i * 10 : i * 10 + 10]
            h = hashlib.md5(" ".join(seg).encode()).hexdigest()
            rows.append((h, len(seg)))
            o = owners[h]
            o[0] = min(o[0], did)
            o[1].add(did)
        segs[did] = rows
    assert set(got) == set(segs)
    for did, rows in segs.items():
        n_seg = len(rows)
        shared = sum(1 for h, _ in rows if len(owners[h][1]) >= 2)
        n_tok = sum(l for _, l in rows)
        kept = sum(
            l for h, l in rows if len(owners[h][1]) < 2 or did == owners[h][0]
        )
        g = got[did]
        assert g[0] == n_seg and g[1] == shared
        assert abs(g[2] - shared / n_seg) < 1e-4
        assert g[3] == n_tok and g[4] == kept


def test_dedup_containment_matches_python(spark):
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in Q.queries()["dedup_containment"](spark, SF).collect()
    }
    shs = {}
    for did, text in _corpus():
        n = _norm(text)
        n_sh = max(len(n) - 11, 1)
        shs[did] = {n[i : i + 12] for i in range(n_sh)}
    ids = sorted(shs)
    # invert: shingle -> docs, to keep the pair loop subquadratic
    inv = defaultdict(list)
    for d, ss in shs.items():
        for s in ss:
            inv[s].append(d)
    inter = Counter()
    for docs_w in inv.values():
        for i, a in enumerate(docs_w):
            for b in docs_w[i + 1 :]:
                inter[(a, b)] += 1
                inter[(b, a)] += 1
    want = {}
    for (a, b), c in inter.items():
        cont = _rhu(c / len(shs[a]), 4)
        if cont >= 0.9:
            want[(a, b)] = cont
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 2e-4


def test_dedup_ngram_jaccard_matches_python(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in Q.queries()["dedup_ngram_jaccard"](spark, SF).collect()
    }
    hsets = {}
    for did, text in _corpus():
        n = _norm(text)
        n_sh = max(len(n) - 4, 1)
        hsets[did] = {_h60(n[i : i + 5]) for i in range(n_sh)}
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
    want = {}
    for (a, b), c in inter.items():
        j = _rhu(c / (len(hsets[a]) + len(hsets[b]) - c), 4)
        if j >= 0.6:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 2e-4


def test_dedup_minhash_uncapped_matches_python(spark):
    got = {
        (r["id_a"], r["id_b"])
        for r in Q.queries()["dedup_minhash"](spark, SF).collect()
    }
    buckets = defaultdict(list)
    for did, text in _corpus():
        n = _norm(text)
        n_sh = max(len(n) - 4, 1)
        xs = {_h60(n[i : i + 5]) % P60 for i in range(n_sh)}
        sig = [min((a * x + b) % P60 for x in xs) for a, b in COEFFS]
        for band in range(4):
            key = ",".join(str(v) for v in sig[band * 4 : band * 4 + 4])
            buckets[(band, hashlib.md5(key.encode()).hexdigest())].append(did)
    want = set()
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                want.add((a, b))
    assert got == want


def test_zipf_slope_matches_numpy(spark):
    got = Q.queries()["zipf_token_slope"](spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter()
    for t in docs.text:
        cnt.update(_tokens(t))
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    lx = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    ly = np.log(np.array([f for _, f in ranked], dtype=float))
    vx = ((lx - lx.mean()) ** 2).sum()
    slope = ((lx - lx.mean()) * (ly - ly.mean())).sum() / vx
    intercept = ly.mean() - slope * lx.mean()
    r2 = np.corrcoef(lx, ly)[0, 1] ** 2
    assert got["n_tokens"] == len(ranked)
    assert abs(got["slope"] - slope) < 1e-3
    assert abs(got["intercept"] - intercept) < 1e-3
    assert abs(got["r2"] - r2) < 1e-3
