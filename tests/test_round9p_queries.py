"""Independent Python references, batch 15: the last two catalog
queries without one (semantic decontamination, gzip-JSONL roundtrip)
plus a from-first-principles replay of the ACID transaction log —
pure-python log reading + pyarrow file scans, never TxnTable's own
replay code — covering append/overwrite/delete-vector semantics."""

import hashlib
import json
import math
import os
import sys
from collections import defaultdict

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def _rhu(x, digits):
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def test_decontaminate_semantic_matches_python(spark):
    """Query-level reference for the asymmetric multi-band sign-bit
    contamination gate: benchmark = every 23rd vector re-keyed +500000,
    candidate pairs meet in band-0 (dims 1-8) or band-1 (dims 9-16)
    sign cells, cosine = 4-rounded raw ratio, keep >= 0.9, report per
    corpus vector its match count and the (cosine desc, bench_id asc)
    best match."""
    got = {
        r["vec_id"]: (r["best_bench_id"], r["max_cosine"], r["n_bench_matches"])
        for r in Q.queries()["decontaminate_semantic_embeddings"](spark, SF).collect()
    }
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float32).astype(np.float64)
        for r in emb.itertuples()
    }
    bench = {k + 500000: v for k, v in vecs.items() if k % 23 == 0}
    norms = {k: math.sqrt(float(v @ v)) for k, v in vecs.items()}
    bnorms = {k: math.sqrt(float(v @ v)) for k, v in bench.items()}

    def cell(v, off):
        return sum((1 << j) for j in range(8) if v[off + j] > 0)

    bcells = defaultdict(list)
    for bid, v in bench.items():
        for band, off in ((0, 0), (1, 8)):
            bcells[(band, cell(v, off))].append(bid)
    matches = defaultdict(set)
    for cid, v in vecs.items():
        for band, off in ((0, 0), (1, 8)):
            for bid in bcells[(band, cell(v, off))]:
                cos = _rhu(float(v @ bench[bid]) / (norms[cid] * bnorms[bid]), 4)
                if cos >= 0.9:
                    matches[cid].add((bid, cos))
    want = {}
    for cid, ms in matches.items():
        best = min(ms, key=lambda t: (-t[1], t[0]))
        want[cid] = (best[0], best[1], len(ms))
    assert set(got) == set(want)
    for cid, (bid, cos, nm) in want.items():
        g = got[cid]
        assert g[0] == bid and g[2] == nm, cid
        assert abs(g[1] - cos) < 2e-4, cid
    # the planted self-match (vec_id % 23 == 0 -> bench_id = vec_id +
    # 500000 at cosine 1.0) must always be flagged
    for cid in vecs:
        if cid % 23 == 0:
            assert cid in got and got[cid][0] <= cid + 500000


def test_jsonl_gzip_roundtrip_matches_python(spark):
    """The gzip-JSONL dump/re-read must preserve content byte-exactly:
    the reference computes the same per-language ordered md5 straight
    from the source parquet — any JSON escaping/codec corruption in the
    roundtrip diverges the digest."""
    got = {
        r["lang"]: (r["n_docs"], r["id_sum"], r["char_sum"], r["content_md5"])
        for r in Q.queries()["jsonl_gzip_roundtrip"](spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for lang, g in docs.groupby("lang"):
        keys = sorted(f"{int(r.doc_id):010d}:{r.text}" for r in g.itertuples())
        digest = hashlib.md5("|".join(keys).encode("utf-8")).hexdigest()
        want[str(lang)] = (
            len(g),
            int(g.doc_id.sum()),
            int(g.n_chars.sum()),
            digest,
        )
    assert got == want


def _py_replay(table_path, version):
    """From-first-principles txn-log replay: read the commit JSONs
    directly (no checkpoints — replay every commit from 0), apply
    add/remove/dv actions, and materialize the snapshot with pyarrow.
    Returns a pandas DataFrame of the live rows at ``version``."""
    import pyarrow.parquet as pq

    log = os.path.join(table_path, "_txn_log")
    state = {}
    for v in range(version + 1):
        with open(os.path.join(log, f"{v:010d}.json")) as f:
            rec = json.load(f)
        for action in rec["actions"]:
            if "add" in action:
                state[action["add"]["path"]] = {"dv": None}
            elif "remove" in action:
                state.pop(action["remove"], None)
            elif "dv" in action:
                ent = state[action["dv"]["path"]]
                ent["dv"] = sorted(
                    set(ent["dv"] or []) | set(action["dv"]["positions"])
                )
    parts = []
    for rel, ent in sorted(state.items()):
        pdf = pq.read_table(os.path.join(table_path, rel)).to_pandas()
        if ent["dv"]:
            pdf = pdf.drop(index=ent["dv"])
        parts.append(pdf)
    if not parts:
        return pd.DataFrame()
    return pd.concat(parts, ignore_index=True)


def test_acid_log_replay_matches_python(spark, tmp_path):
    """TxnTable's snapshot resolution vs an independent python replay of
    its own on-disk log — every version of an append/append/overwrite/
    delete history must agree row-for-row with reading the commit JSONs
    and parquet files directly."""
    from pyspark.sql import functions as F

    from simpletasks_data_spark.plans.acid import TxnTable
    from simpletasks_data_spark.queries import load

    orders = load(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    t = TxnTable(spark, str(tmp_path / "acid_ref"))
    t.append(orders.where(F.col("o_orderstatus") == "F"))
    t.append(orders.where(F.col("o_orderstatus") == "O"))
    t.overwrite(orders.where(F.col("o_orderkey") % 7 == 0))
    # merge-on-read delete so the replay exercises the dv action path
    t.delete_dv(F.col("o_orderkey") % 3 == 0)

    src = orders.toPandas()
    expect = {
        0: src[src.o_orderstatus == "F"],
        1: src[src.o_orderstatus.isin(["F", "O"])],
        2: src[src.o_orderkey % 7 == 0],
        3: src[(src.o_orderkey % 7 == 0) & (src.o_orderkey % 3 != 0)],
    }
    for v in range(4):
        via_table = sorted(
            (r["o_orderkey"], r["o_orderstatus"])
            for r in t.read(version=v).collect()
        )
        via_log = _py_replay(str(tmp_path / "acid_ref"), v)
        via_log_rows = (
            sorted(zip(via_log.o_orderkey.astype(int), via_log.o_orderstatus))
            if len(via_log)
            else []
        )
        want = sorted(zip(expect[v].o_orderkey.astype(int), expect[v].o_orderstatus))
        assert via_table == want, f"TxnTable.read v{v}"
        assert via_log_rows == want, f"python log replay v{v}"


def test_acid_checkpoint_replay_matches_python(spark, tmp_path):
    """Cross the checkpoint boundary (checkpoint_every=10): TxnTable
    resolves snapshots from the newest checkpoint + tail, while the
    python reference replays EVERY commit from 0 — the two must agree
    at every version, pinning that checkpoints are pure accelerators
    and never change snapshot contents."""
    from pyspark.sql import functions as F

    from simpletasks_data_spark.plans.acid import TxnTable
    from simpletasks_data_spark.queries import load

    orders = load(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    t = TxnTable(spark, str(tmp_path / "acid_ck"), checkpoint_every=10)
    for m in range(12):  # versions 0..11; checkpoint lands at v10
        t.append(orders.where(F.col("o_orderkey") % 12 == m).coalesce(1))
    log_dir = str(tmp_path / "acid_ck" / "_txn_log")
    assert any(n.endswith(".checkpoint.json") for n in os.listdir(log_dir))
    src = orders.toPandas()
    for v in (0, 9, 10, 11):
        via_table = sorted(
            int(r["o_orderkey"]) for r in t.read(version=v).collect()
        )
        via_log = _py_replay(str(tmp_path / "acid_ck"), v)
        want = sorted(
            int(k) for k in src.o_orderkey[src.o_orderkey % 12 <= v].tolist()
        )
        assert via_table == want, f"TxnTable.read v{v}"
        assert sorted(via_log.o_orderkey.astype(int)) == want, f"replay v{v}"
