"""Independent Python/pandas/numpy references, batch 5: layout, audit,
and feature-engineering queries — the 16-bit Hilbert walk, XOR
anti-entropy checksums, join-fanout and skew audits, lag features,
inverted index, per-domain caps, centroid drift, hard negatives, IVF
centroids."""

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


def _rhu(x, nd):
    s = 10 ** nd
    return math.floor(x * s + 0.5) / s if x >= 0 else math.ceil(x * s - 0.5) / s


def _xy2d16(x, y):
    d = 0
    s = 1 << 15
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            nx = (s - 1 - y) if rx == 1 else y
            ny = (s - 1 - x) if rx == 1 else x
            x, y = nx, ny
        s >>= 1
    return d


def test_hilbert_layout_matches_python(spark):
    got = {
        r["bucket"]: (r["n"], r["custkey_min"], r["custkey_max"], r["day_min"], r["day_max"])
        for r in Q.queries()["hilbert_layout_orders"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    dday = (pd.to_datetime(o.o_orderdate) - pd.Timestamp("1992-01-01")).dt.days
    rows = sorted(
        (_xy2d16(int(ck) % 65536, int(dd) % 65536), int(ok), int(ck), int(dd))
        for ok, ck, dd in zip(o.o_orderkey, o.o_custkey, dday)
    )
    n = len(rows)
    base, rem = divmod(n, 32)
    want = {}
    i = 0
    for b in range(1, 33):
        sz = base + (1 if b <= rem else 0)
        chunk = rows[i : i + sz]
        i += sz
        want[b] = (
            sz,
            min(r[2] for r in chunk),
            max(r[2] for r in chunk),
            min(r[3] for r in chunk),
            max(r[3] for r in chunk),
        )
    assert got == want


def test_integrity_checksums_match_python(spark):
    got = {
        r["nation"]: (r["n_rows"], r["checksum"])
        for r in Q.queries()["integrity_checksums_by_nation"](spark, SF).collect()
    }
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    agg = defaultdict(lambda: [0, 0])
    for r in cust.itertuples():
        cents = int(_rhu(r.c_acctbal * 100, 0))
        h = int(
            hashlib.md5(f"{r.c_custkey}|{r.c_name}|{cents}".encode()).hexdigest()[:15],
            16,
        )
        a = agg[r.c_nationkey]
        a[0] += 1
        a[1] ^= h
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_join_fanout_audit_matches_python(spark):
    got = [
        (r["user_id"], r["n_click"], r["n_purchase"], r["fanout"])
        for r in Q.queries()["join_fanout_audit"](spark, SF).collect()
    ]
    ev = pd.read_parquet(f"{SF}/events.parquet")
    c = ev[ev.event_type == "click"].groupby("user_id").size()
    p = ev[ev.event_type == "purchase"].groupby("user_id").size()
    f = [
        (u, int(c[u]), int(p[u]), int(c[u] * p[u]))
        for u in set(c.index) & set(p.index)
    ]
    f.sort(key=lambda t: (-t[3], t[0]))
    assert got == f[:10]


def test_skew_diagnosis_matches_python(spark):
    got = Q.queries()["skew_diagnosis_orders"](spark, SF).collect()[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    k = o.groupby("o_custkey").size()
    counts = sorted(zip(k.values, k.index))
    nk, tot, mx = len(counts), int(k.sum()), int(k.max())
    p50 = counts[math.ceil(nk * 0.5) - 1][0]
    p99 = counts[math.ceil(nk * 0.99) - 1][0]
    assert (got["n_keys"], got["n_rows"], got["max_rows_per_key"]) == (nk, tot, mx)
    assert got["p50_rows"] == p50 and got["p99_rows"] == p99
    assert abs(got["top_key_share"] - mx / tot) < 1e-5
    assert abs(got["skew_ratio"] - mx / p50) < 1e-3


def test_ml_lag_features_match_pandas(spark):
    got = {
        (r["event_type"], r["day"]): (r["n"], r["lag_1"], r["lag_7"], r["ma_7"], r["n_window"])
        for r in Q.queries()["ml_lag_features"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        ev.assign(day=ev.ts.dt.floor("d").dt.date)
        .groupby(["event_type", "day"])
        .size()
        .reset_index(name="n")
    )
    for et, g in daily.groupby("event_type"):
        rows = sorted(g.itertuples(), key=lambda r: r.day)
        for i, r in enumerate(rows):
            win = [x.n for x in rows[max(0, i - 6) : i + 1]]
            gg = got[(et, r.day)]
            assert gg[0] == r.n
            assert gg[1] == (rows[i - 1].n if i >= 1 else None)
            assert gg[2] == (rows[i - 7].n if i >= 7 else None)
            assert abs(gg[3] - sum(win) / len(win)) < 1e-3
            assert gg[4] == len(win)


def test_inverted_index_matches_python(spark):
    got = {
        r["token"]: (r["doc_freq"], r["postings_head"], r["postings_checksum"])
        for r in Q.queries()["inverted_index_terms"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    post = defaultdict(list)
    for r in docs.itertuples():
        for t in set(_tokens(r.text)):
            post[t].append(r.doc_id)
    want = {}
    for t, ds in post.items():
        if len(ds) >= 25:
            ds = sorted(ds)
            want[t] = (len(ds), "-".join(str(d) for d in ds[:8]), sum(ds))
    assert got == want


def test_domain_cap_sample_matches_python(spark):
    got = {
        r["host"]: (r["n_total"], r["n_kept"], r["first_kept_doc"], r["kept_chars"])
        for r in Q.queries()["domain_cap_sample"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    byhost = defaultdict(list)
    for r in docs.itertuples():
        byhost[f"h{r.doc_id % 37}"].append((r.doc_id, r.n_chars))
    want = {}
    for host, rows in byhost.items():
        kept = sorted(rows, key=lambda t: (-t[1], t[0]))[:5]
        want[host] = (
            len(rows),
            len(kept),
            min(d for d, _ in kept),
            sum(c for _, c in kept),
        )
    assert got == want


def _emb():
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    return emb, {
        r.vec_id: np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        for r in emb.itertuples()
    }


def test_embedding_drift_by_label_matches_numpy(spark):
    got = {
        r["group"]: (r["n_vecs"], r["drift_cosine"])
        for r in Q.queries()["embedding_drift_by_label"](spark, SF).collect()
    }
    emb, vecs = _emb()
    g_mean = np.array(
        [_rhu(float(np.mean([v[d] for v in vecs.values()])), 6) for d in range(64)]
    )
    for label, grp in emb.groupby("label"):
        members = [vecs[i] for i in grp.vec_id]
        c = np.array(
            [_rhu(float(np.mean([m[d] for m in members])), 6) for d in range(64)]
        )
        cos = float(c @ g_mean) / (
            math.sqrt(float(c @ c)) * math.sqrt(float(g_mean @ g_mean))
        )
        gg = got[label]
        assert gg[0] == len(members)
        assert abs(gg[1] - cos) < 2e-4, label


def test_hard_negatives_match_python(spark):
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["neighbor_label"], r["cosine"])
        for r in Q.queries()["hard_negatives_embeddings"](spark, SF).collect()
    }
    emb, vecs = _emb()
    labels = dict(zip(emb.vec_id, emb.label))
    norms = {k: math.sqrt(float(v @ v)) for k, v in vecs.items()}
    ids = sorted(vecs)
    want = {}
    for q in ids:
        if q % 25 != 0:
            continue
        sims = sorted(
            (
                (-_rhu(float(vecs[q] @ vecs[c]) / (norms[q] * norms[c]), 6), c)
                for c in ids
                if c != q and labels[c] != labels[q]
            )
        )[:3]
        for i, (ns, c) in enumerate(sims):
            # display cosine = 4-round of the RAW ratio (no double-round)
            raw = float(vecs[q] @ vecs[c]) / (norms[q] * norms[c])
            want[(q, i + 1)] = (c, labels[c], _rhu(raw, 4))
    assert set(got) == set(want)
    for k, (c, lb, cos) in want.items():
        g = got[k]
        assert g[0] == c and g[1] == lb, k
        assert abs(g[2] - cos) < 2e-4


def test_ivf_centroids_match_numpy(spark):
    got = {
        (r["cell"], r["dim"]): (r["n_vectors"], r["c"])
        for r in Q.queries()["ivf_centroids_by_cell"](spark, SF).collect()
    }
    emb, vecs = _emb()
    cells = defaultdict(list)
    for vid, v in vecs.items():
        cell = sum((1 << j) for j in range(6) if v[j] > 0)
        cells[cell].append(v)
    want = {}
    for cell, members in cells.items():
        for d in range(64):
            m = _rhu(float(np.mean([v[d] for v in members])), 4)
            want[(cell, d + 1)] = (len(members), m + 0.0)
    assert set(got) == set(want)
    for k, (n, m) in want.items():
        g = got[k]
        assert g[0] == n
        assert abs(g[1] - m) < 2e-4, k
