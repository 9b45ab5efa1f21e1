"""Round-11 optimization equivalence pins.

Every optimization this round must leave query RESULTS identical; these
tests pin the new fast paths against the unchanged slow paths on real
testdata so a future refactor cannot silently diverge them:

- the shared (doc_id, token, tf) store feeding bm25/jaccard retrieval
  (``tf_frame`` / ``tok_frame`` operator parameters),
- the gated node-side broadcast in the iterative graph operators
  (``broadcast_nodes_limit``), and
- ``dedup_minhash_eval``'s verified-pairs-store truth leg vs the direct
  subsample PPJoin.
"""

import pytest

from pyspark.sql import functions as F

from simpletasks_data_spark import queries as Q
from simpletasks_data_spark.functions import text as TX

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_bm25_tf_frame_path_matches_default(spark):
    from simpletasks_data_spark.operators.corpus import bm25_related_docs

    docs = Q.load(spark, SF, "documents")
    tf = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    cols = ["query_id", "doc_id", "rank", "score"]
    default = bm25_related_docs(docs, k=5, max_df_permille=900)
    stored = bm25_related_docs(docs, k=5, max_df_permille=900, tf_frame=tf)
    assert _rows(default, cols) == _rows(stored, cols)


def test_jaccard_tok_frame_path_matches_default(spark):
    from simpletasks_data_spark.operators.corpus import jaccard_related_docs

    docs = Q.load(spark, SF, "documents")
    tf_keys = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .select("doc_id", "token")
    )
    cols = ["query_id", "doc_id", "rank", "jaccard"]
    default = jaccard_related_docs(docs, k=20)
    stored = jaccard_related_docs(docs, k=20, tok_frame=tf_keys)
    assert _rows(default, cols) == _rows(stored, cols)


def test_pagerank_broadcast_gate_is_result_invariant(spark):
    """broadcast_nodes_limit only changes the JOIN STRATEGY; scores must
    be bit-identical with the gate forced off (limit 0 -> SMJ path) and
    on (default -> node-side broadcast)."""
    from simpletasks_data_spark.operators.graph import pagerank

    pairs = Q._trade_pairs_store(spark, SF).select(
        "c", (F.col("s") + 1000000).alias("s")
    )
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    on = pagerank(edges, iterations=4)
    off = pagerank(edges, iterations=4, broadcast_nodes_limit=0)
    assert _rows(on, ["id", "score"]) == _rows(off, ["id", "score"])


def test_minhash_eval_store_and_cold_paths_agree(spark):
    """The eval's truth leg must produce the same report whether it
    filters the full-corpus verified-pairs store or runs the direct
    subsample PPJoin (Jaccard of a pair is corpus-independent)."""
    key = (id(spark.sparkContext), SF)
    q = Q.queries()
    # cold path: make sure the store is absent for this (session, sf)
    Q._NGRAM_PAIRS_STORE.pop(key, None)
    cold = q["dedup_minhash_eval"](spark, SF).collect()[0].asDict()
    # warm path: build the store via the owning query, then re-run
    q["dedup_ngram_jaccard"](spark, SF).count()
    assert key in Q._NGRAM_PAIRS_STORE
    warm = q["dedup_minhash_eval"](spark, SF).collect()[0].asDict()
    assert cold == warm


def test_als_factors_store_hit_matches_rebuild(spark):
    """The session-level ALS factor store must return exactly what a
    cold rebuild computes (deterministic integer micro-factors)."""
    q = Q.queries()
    key = (id(spark.sparkContext), SF)
    Q._ALS_FACTORS_STORE.pop(key, None)
    cold = _rows(q["als_factors_retail"](spark, SF), ["id", "role", "fx_micro", "fy_micro"])
    assert key in Q._ALS_FACTORS_STORE
    warm = _rows(q["als_factors_retail"](spark, SF), ["id", "role", "fx_micro", "fy_micro"])
    assert cold == warm and len(cold) > 0


def test_containment_fused_prefix_matches_bruteforce(spark):
    """The r11 fused per-doc aggregation (array_sort(struct(df, sh)) +
    slice replacing the row_number window) must keep containment_pairs
    EXACT: compare against brute-force distinct-shingle containment on
    the real sf0.001 corpus."""
    from simpletasks_data_spark.functions.text import normalize_text
    from simpletasks_data_spark.operators.dedupe import containment_pairs

    corpus = Q._corpus(spark, SF)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(corpus, "id", "text", n=12, threshold=0.9).collect()
    }
    n = 12
    docs = {
        r["id"]: r["_n"]
        for r in corpus.select("id", normalize_text("text").alias("_n")).collect()
    }
    sets = {
        i: {t[k : k + n] for k in range(max(len(t) - n + 1, 1))}
        for i, t in docs.items()
    }
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            c = round(len(sa & sb) / len(sa), 4)
            if c >= 0.9:
                want[(a, b)] = c
    assert got == want


def test_percolation_thread_pool_report_complete(spark):
    """The overlapped percentile sweeps must still emit exactly the
    three report rows in (50, 90, 99) with a non-shrinking threshold."""
    out = Q.queries()["graph_percolation_supplier"](spark, SF).collect()
    by_q = {r["support_pctile"]: r for r in out}
    assert sorted(by_q) == [50, 90, 99]
    assert by_q[50]["threshold"] <= by_q[90]["threshold"] <= by_q[99]["threshold"]
    assert all(r["n_edges"] >= 0 and r["giant_size"] >= 0 for r in out)
