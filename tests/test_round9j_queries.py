"""Independent Python references, batch 10: the text heuristics, corpus
management, product-analytics reports, propensity matching, and the FULL
fuzzy-dedup pipeline (signatures -> bands -> agreement filter -> exact
Jaccard verify -> connected components) recomputed end to end in
python — pinning dedup_minhash_verified, dedup_clusters,
dedup_canonical_by_quality, and dedup_rate_by_source against a
shared-nothing transcription."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict

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


def _verified_and_clusters():
    """Python transcription of the _minhash_verified/_DEDUP_CLUSTERS
    chain: 5-char shingle 60-bit hash sets, 16 minhashes, 4 bands,
    all-pairs band candidates, signature agreement >= 8, exact Jaccard
    >= 0.6 (rounded 1e-4), then min-label connected components."""
    hsets, sigs = {}, {}
    for did, text in _corpus():
        n = _norm(text)
        n_sh = max(len(n) - 4, 1)
        xs = {_h60(n[i : i + 5]) % P60 for i in range(n_sh)}
        hsets[did] = xs
        sigs[did] = [min((a * x + b) % P60 for x in xs) for a, b in COEFFS]
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
    verified = {}
    for a, b in cand:
        agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
        if agree < 8:
            continue
        inter = len(hsets[a] & hsets[b])
        if inter == 0:
            continue
        j = _rhu(inter / (len(hsets[a]) + len(hsets[b]) - inter), 4)
        if j >= 0.6:
            verified[(a, b)] = j
    adj = defaultdict(set)
    for a, b in verified:
        adj[a].add(b)
        adj[b].add(a)
    clusters = {}
    for n0 in sorted(adj):
        if n0 in clusters:
            continue
        comp, stack, seen = [], [n0], {n0}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(comp)
        for x in comp:
            clusters[x] = m
    return verified, clusters


def test_dedup_verified_and_clusters_match_python(spark):
    got_ver = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in Q.queries()["dedup_minhash_verified"](spark, SF).collect()
    }
    verified, clusters = _verified_and_clusters()
    assert set(got_ver) == set(verified)
    for k, j in verified.items():
        assert abs(got_ver[k] - j) < 2e-4, k

    got_cl = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in Q.queries()["dedup_clusters"](spark, SF).collect()
    }
    sizes = Counter(clusters.values())
    want = {
        d: (c, sizes[c], d == c) for d, c in clusters.items()
    }
    assert got_cl == want


def test_dedup_canonical_and_rate_match_python(spark):
    verified, clusters = _verified_and_clusters()
    texts = dict(_corpus())
    got_can = {
        r["cluster_id"]: (r["canonical_id"], r["quality"])
        for r in Q.queries()["dedup_canonical_by_quality"](spark, SF).collect()
    }
    by_cluster = defaultdict(list)
    for d, c in clusters.items():
        by_cluster[c].append(d)
    want_can = {}
    for c, ds in by_cluster.items():
        best = min(ds, key=lambda d: (-len(texts[d]), d))
        want_can[c] = (best, len(texts[best]))
    assert got_can == want_can

    got_rate = {
        r["layer"]: (r["n_docs"], r["n_removed"], r["removal_rate"])
        for r in Q.queries()["dedup_rate_by_source"](spark, SF).collect()
    }
    removed = {d for d, c in clusters.items() if d != c}
    agg = defaultdict(lambda: [0, 0])
    for d, _ in _corpus():
        layer = "near_layer" if d >= 200000 else ("exact_layer" if d >= 100000 else "base")
        agg[layer][0] += 1
        agg[layer][1] += int(d in removed)
    assert set(got_rate) == set(agg)
    for layer, (n, rm) in agg.items():
        g = got_rate[layer]
        assert (g[0], g[1]) == (n, rm)
        assert abs(g[2] - rm / n) < 1e-4


def test_text_langid_fingerprint_quality_match_python(spark):
    from simpletasks_data_spark.functions.text import LANG_LEXICONS, STOPWORDS_EN

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    got_l = {
        r["doc_id"]: r["detected_lang"]
        for r in Q.queries()["text_langid"](spark, SF).collect()
    }
    got_f = {
        r["doc_id"]: r["fingerprint"]
        for r in Q.queries()["text_fingerprint"](spark, SF).collect()
    }
    got_q = {
        r["doc_id"]: r["quality"] for r in Q.queries()["text_quality"](spark, SF).collect()
    }
    stop = set(STOPWORDS_EN)
    for r in docs.itertuples():
        toks = _tokens(r.text)
        # langid
        if not toks:
            want = "und"
        else:
            scores = {
                l: sum(1 for t in toks if t in set(lex)) / len(toks)
                for l, lex in LANG_LEXICONS.items()
            }
            best = max(scores.values())
            want = "und" if best <= 0 else next(
                l for l in LANG_LEXICONS if scores[l] == best
            )
        assert got_l[r.doc_id] == want
        # fingerprint
        fp = hashlib.md5(" ".join(sorted(set(toks))).encode()).hexdigest()
        assert got_f[r.doc_id] == fp
        # quality
        tc = float(len(toks))
        mtl = sum(len(t) for t in toks) / len(toks) if toks else 0.0
        stop_r = sum(1 for t in toks if t in stop) / len(toks) if toks else 0.0
        nospace = r.text.replace(" ", "")
        punct_r = (
            len(re.sub("[a-zA-Z0-9]", "", nospace)) / len(nospace) if nospace else 0.0
        )
        q = (
            min(tc / 20.0, 1.0)
            + (1.0 if 3 <= mtl <= 10 else 0.5)
            + min(stop_r * 4, 1.0)
            + (1.0 - min(punct_r * 4, 1.0))
        ) / 4
        assert abs(got_q[r.doc_id] - q) < 1e-4, r.doc_id


def test_events_sessionize_matches_python(spark):
    got = {
        (r["user_id"], r["session_idx"]): (
            r["n_events"], r["total_value"], r["start_ts"], r["end_ts"]
        )
        for r in Q.queries()["events_sessionize"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    want = {}
    for uid, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))
        idx = 0
        cur = []
        prev = None
        for r in rows:
            if prev is None or (r.ts.value // 10**9 - prev.value // 10**9) > 1800:
                if cur:
                    want[(uid, idx)] = cur
                idx += 1
                cur = []
            cur.append(r)
            prev = r.ts
        want[(uid, idx)] = cur
    assert set(got) == set(want)
    for k, rows in want.items():
        g = got[k]
        assert g[0] == len(rows)
        assert abs(g[1] - sum(r.value for r in rows)) < 1e-3
        assert pd.Timestamp(g[2]) == min(r.ts for r in rows)
        assert pd.Timestamp(g[3]) == max(r.ts for r in rows)


def test_corpus_hash_split_matches_python(spark):
    got = {
        r["split"]: (r["n_docs"], r["total_chars"])
        for r in Q.queries()["corpus_hash_split"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    agg = defaultdict(lambda: [0, 0])
    for r in docs.itertuples():
        b = _h60(str(r.doc_id)) % 1000
        split = "train" if b < 900 else ("val" if b < 950 else "test")
        agg[split][0] += 1
        agg[split][1] += r.n_chars
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_balance_mixture_matches_python(spark):
    got = {
        r["doc_id"]: r["lang"]
        for r in Q.queries()["balance_mixture_langs"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    targets = {"en": 0.5, "zh": 0.15, "es": 0.15, "de": 0.1, "fr": 0.1}
    counts = docs.lang.value_counts().to_dict()
    scale = min(counts[l] / f for l, f in targets.items())
    quotas = {l: int(math.floor(scale * f)) for l, f in targets.items()}
    want = {}
    for lang, g in docs.groupby("lang"):
        if lang not in quotas:
            continue
        ranked = sorted(g.doc_id, key=lambda d: (_h60(str(d)) % 1000000, d))
        for d in ranked[: quotas[lang]]:
            want[d] = lang
    assert got == want


def test_frequent_event_ngrams_match_python(spark):
    got = {
        (r["n"], r["rank"]): (r["pattern"], r["n_users"], r["support"])
        for r in Q.queries()["frequent_event_ngrams"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    users2, users3 = defaultdict(set), defaultdict(set)
    for uid, g in ev.groupby("user_id"):
        seq = [r.event_type for r in sorted(g.itertuples(), key=lambda r: (r.ts, r.event_id))]
        for a, b in zip(seq, seq[1:]):
            users2[f"{a}>{b}"].add(uid)
        for a, b, c in zip(seq, seq[1:], seq[2:]):
            users3[f"{a}>{b}>{c}"].add(uid)
    total = ev.user_id.nunique()
    for n, table in ((2, users2), (3, users3)):
        ranked = sorted(
            ((len(us), p) for p, us in table.items()), key=lambda t: (-t[0], t[1])
        )[:10]
        for i, (nu, pat) in enumerate(ranked):
            g = got[(n, i + 1)]
            assert g[0] == pat and g[1] == nu, (n, i)
            assert abs(g[2] - nu / total) < 1e-4


def test_events_retention_cohorts_match_python(spark):
    got = {
        (pd.Timestamp(r["cohort_week"]), r["week_n"]): r["active_users"]
        for r in Q.queries()["events_retention_cohorts"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    week = lambda t: t.to_period("W-SUN").start_time
    firsts = {
        uid: week(g.ts.min()) for uid, g in ev.groupby("user_id")
    }
    active = {
        (firsts[r.user_id], int((week(r.ts) - firsts[r.user_id]).days // 7))
        for r in ev.itertuples()
        for _ in [0]
    }
    cnt = Counter()
    seen = set()
    for r in ev.itertuples():
        c = firsts[r.user_id]
        wn = int((week(r.ts) - c).days // 7)
        key = (r.user_id, c, wn)
        if key not in seen:
            seen.add(key)
            cnt[(c, wn)] += 1
    assert got == dict(cnt)


def test_corpus_health_matches_python(spark):
    got = {
        r["source"]: (r["n_docs"], r["n_langs"], r["avg_chars"], r["avg_tokens"], r["n_dup_content_docs"])
        for r in Q.queries()["corpus_health_by_source"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ck = docs.text.map(lambda t: hashlib.md5(_norm(t).encode()).hexdigest())
    ckn = ck.value_counts().to_dict()
    docs = docs.assign(ck=ck, n_toks=docs.text.map(lambda t: len(_tokens(t))))
    for src, g in docs.groupby("source"):
        dup = int(sum(1 for c in g.ck if ckn[c] >= 2))
        gg = got[src]
        assert gg[0] == len(g) and gg[1] == g.lang.nunique()
        assert abs(gg[2] - g.n_chars.mean()) < 1e-3
        assert abs(gg[3] - g.n_toks.mean()) < 1e-3
        assert gg[4] == dup


def test_propensity_match_matches_python(spark):
    got = {
        r["t_key"]: (r["c_key"], r["gap_micro"], r["dy_dollars"])
        for r in Q.queries()["propensity_match_urgent"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet")
    days = (pd.to_datetime(o.o_orderdate) - pd.Timestamp("1992-01-01")).dt.days
    rows = [
        (int(k), 1.0 if pr == "1-URGENT" else 0.0, tp / 100000.0, d / 1000.0)
        for k, pr, tp, d in zip(o.o_orderkey, o.o_orderpriority, o.o_totalprice, days)
    ]
    # identical GD transcription as test_round9i
    w = [0.0, 0.0, 0.0]
    for _ in range(5):
        S = [0, 0, 0]
        n = 0
        for okey, y, x1, x2 in rows:
            z = w[0] + w[1] * x1 + w[2] * x2
            resid = y - 1.0 / (1.0 + math.exp(-z))
            for k, val in enumerate((resid, resid * x1, resid * x2)):
                S[k] += math.floor(val * 1e9 + 0.5)
            n += 1
        w = [_rhu(w[k] + S[k] / n / 1e9, 6) for k in range(3)]
    scored = [
        (okey, y, int(_rhu(1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2))) * 1e6, 0)))
        for okey, y, x1, x2 in rows
    ]
    creps = {}
    for okey, y, si in scored:
        if y == 0.0 and (si not in creps or okey < creps[si]):
            creps[si] = okey
    controls = sorted(creps.items())  # (v, key)
    import bisect

    cvs = [v for v, _ in controls]
    dollars = {int(k): int(math.floor(t)) for k, t in zip(o.o_orderkey, o.o_totalprice)}
    want = {}
    for okey, y, si in scored:
        if y != 1.0:
            continue
        i = bisect.bisect_right(cvs, si)
        pv = controls[i - 1] if i >= 1 else None
        nv = controls[i] if i < len(controls) else None
        if pv is not None and (nv is None or si - pv[0] <= nv[0] - si):
            ck, gap = pv[1], si - pv[0]
        elif nv is not None:
            ck, gap = nv[1], nv[0] - si
        else:
            continue
        if gap <= 5000:
            want[okey] = (ck, gap, dollars[okey] - dollars[ck])
    assert got == want
