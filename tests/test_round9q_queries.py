"""Independent Python references, batch 16: the six round-9 curation
diagnostics — dataset cartography over the GD trajectory, the SimHash
Hamming calibration histogram, the temperature mixture/epoch planner,
the exact doc-length percentile grid, the character-class script-mix
report, and the embedding hubness (k-occurrence) report."""

import datetime
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


def _rhu(x, digits):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _docs():
    return pd.read_parquet(f"{SF}/documents.parquet")


def test_training_dynamics_cartography_matches_python(spark):
    """Full from-scratch reference: rebuild the (y, x1, x2) features in
    pandas, run the 5-round integer-sufficient-statistic GD with exact
    python-int gradient sums, score every example against each round's
    weights, bucket, and aggregate with the same nano-quantized sums."""
    got = {
        r["bucket"]: (r["n_examples"], r["avg_confidence"], r["avg_variability"])
        for r in Q.queries()["training_dynamics_cartography"](spark, SF).collect()
    }
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    epoch = datetime.date(1992, 1, 1)
    y = (orders.o_orderpriority == "1-URGENT").astype(float).to_numpy()
    x1 = (orders.o_totalprice / 100000.0).to_numpy()
    x2 = np.array(
        [(d.date() - epoch).days / 1000.0 for d in pd.to_datetime(orders.o_orderdate)]
    )
    w = [0.0, 0.0, 0.0]
    traj = []
    n = len(y)
    for _ in range(5):
        z = w[0] + w[1] * x1 + w[2] * x2
        resid = y - 1.0 / (1.0 + np.exp(-z))
        sums = [
            sum(math.floor(v * 1e9 + 0.5) for v in resid),
            sum(math.floor(v * 1e9 + 0.5) for v in resid * x1),
            sum(math.floor(v * 1e9 + 0.5) for v in resid * x2),
        ]
        w = [_rhu(w[k] + 1.0 * (float(sums[k]) / n / 1e9), 6) for k in range(3)]
        traj.append(list(w))
    ms = []
    for w0, w1, w2 in traj:
        p = 1.0 / (1.0 + np.exp(-(w0 + w1 * x1 + w2 * x2)))
        ms.append(y * p + (1.0 - y) * (1.0 - p))
    conf = (ms[0] + ms[1] + ms[2] + ms[3] + ms[4]) / 5.0
    ss = (ms[0] * ms[0] + ms[1] * ms[1] + ms[2] * ms[2] + ms[3] * ms[3] + ms[4] * ms[4]) / 5.0
    var = np.sqrt(np.maximum(ss - conf * conf, 0.0))
    buckets = np.where(
        var >= 0.09, "ambiguous", np.where(conf >= 0.6, "easy", np.where(conf < 0.4, "hard", "mid"))
    )
    want = {}
    for b in np.unique(buckets):
        m = buckets == b
        nb = int(m.sum())
        sc = sum(math.floor(v * 1e9 + 0.5) for v in conf[m])
        sv = sum(math.floor(v * 1e9 + 0.5) for v in var[m])
        want[str(b)] = (nb, _rhu(float(sc) / nb / 1e9, 4), _rhu(float(sv) / nb / 1e9, 4))
    assert got == want


def test_simhash_hamming_histogram_matches_python(spark):
    got = {
        r["hamming"]: r["n_pairs"]
        for r in Q.queries()["simhash_hamming_histogram"](spark, SF).collect()
    }
    docs = _docs()
    corpus = {int(r.doc_id): r.text for r in docs.itertuples()}
    corpus.update(
        {int(r.doc_id) + 100000: r.text for r in docs.itertuples() if r.doc_id % 13 == 0}
    )
    corpus.update(
        {
            int(r.doc_id) + 200000: r.text + " extra token tail"
            for r in docs.itertuples()
            if r.doc_id % 10 == 0
        }
    )
    sigs = {}
    for did, text in corpus.items():
        acc = [0] * 32
        for t in _tokens(text):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for b in range(32):
                acc[b] += 1 if (h >> b) & 1 else -1
        sigs[did] = sum((1 << b) for b in range(32) if acc[b] > 0)
    buckets = defaultdict(list)
    for did, s in sigs.items():
        for band in range(4):
            buckets[(band, (s >> (band * 8)) & 255)].append(did)
    pairs = set()
    for members in buckets.values():
        members = sorted(members)
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                pairs.add((a, b))
    want = Counter(bin(sigs[a] ^ sigs[b]).count("1") for a, b in pairs)
    assert got == dict(want)


def test_mixture_epoch_plan_matches_python(spark):
    got = {
        r["source"]: (
            r["n_docs"], r["n_tokens"], r["weight"],
            r["planned_tokens"], r["epochs"], r["repeat_risk"],
        )
        for r in Q.queries()["mixture_epoch_plan"](spark, SF).collect()
    }
    docs = _docs()
    agg = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        e = agg[r.source]
        e[0] += 1
        e[1] += len(_tokens(r.text))
    zsum = 0.0
    for s in sorted(agg):  # ordered fold, source-sorted
        zsum = zsum + agg[s][1] ** 0.7
    want = {}
    for s, (nd, nt) in agg.items():
        share = nt ** 0.7 / zsum
        epochs = 3000000.0 * share / nt
        want[s] = (
            nd, nt, _rhu(share, 6),
            int(math.floor(3000000.0 * share + 0.5)),
            _rhu(epochs, 4), epochs > 4.0,
        )
    assert got == want


def test_doclen_percentile_grid_matches_python(spark):
    got = {
        (r["source"], r["pct"]): (r["n_docs"], r["len_at_pct"])
        for r in Q.queries()["doclen_percentile_grid"](spark, SF).collect()
    }
    docs = _docs()
    by_src = defaultdict(list)
    for r in docs.itertuples():
        by_src[r.source].append((len(_tokens(r.text)), int(r.doc_id)))
    want = {}
    for s, rows in by_src.items():
        rows.sort()
        n = len(rows)
        for pct in (10, 25, 50, 75, 90, 99):
            rank = (pct * n + 99) // 100  # = ceil(pct*n/100), pure ints
            want[(s, pct)] = (n, rows[rank - 1][0])
    assert got == want


def test_script_mix_report_matches_python(spark):
    got = {
        r["lang"]: tuple(r.asDict().values())[1:]
        for r in Q.queries()["script_mix_report"](spark, SF).collect()
    }
    docs = _docs()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, total, lo, up, dig, sp
    for r in docs.itertuples():
        e = agg[r.lang]
        e[0] += 1
        e[1] += len(r.text)
        e[2] += sum(1 for ch in r.text if "a" <= ch <= "z")
        e[3] += sum(1 for ch in r.text if "A" <= ch <= "Z")
        e[4] += sum(1 for ch in r.text if "0" <= ch <= "9")
        e[5] += sum(1 for ch in r.text if ch == " ")
    want = {}
    for lang, (nd, tot, lo, up, dig, sp) in agg.items():
        want[lang] = (
            nd, tot,
            _rhu(lo / tot, 4), _rhu(up / tot, 4), _rhu(dig / tot, 4),
            _rhu(sp / tot, 4), _rhu((tot - lo - up - dig - sp) / tot, 4),
        )
    assert got == want


def test_hubness_report_matches_python(spark):
    got = {
        r["k_occurrences"]: r["n_vectors"]
        for r in Q.queries()["hubness_report_embeddings"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        for r in emb.itertuples()
    }
    norms = {k: math.sqrt(float(v @ v)) for k, v in vecs.items()}
    cells = defaultdict(list)
    for vid, v in vecs.items():
        cells[sum((1 << j) for j in range(6) if v[j] > 0)].append(vid)
    occ = Counter()
    for members in cells.values():
        for q in members:
            sims = sorted(
                (
                    (-_rhu(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
                    for c in members
                    if c != q
                )
            )[:3]
            for _, c in sims:
                occ[c] += 1
    want = Counter(occ[vid] for vid in vecs)
    assert got == dict(want)
