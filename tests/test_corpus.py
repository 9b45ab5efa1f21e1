"""Corpus-management operators: determinism, exact semantics on crafted
rows (the sf-scale parity lives in test_oracle_parity)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from simpletasks_data_spark.operators import corpus as CP  # noqa: E402
from simpletasks_data_spark.operators.similarity import ivf_centroids  # noqa: E402


def _docs(spark):
    rows = [(i, f"doc number {i} body text", "en" if i % 2 else "fr", "s", 10) for i in range(200)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_hash_split_deterministic_and_total(spark):
    d = _docs(spark)
    a = {r["doc_id"]: r["split"] for r in CP.hash_split(d, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in CP.hash_split(d, "doc_id").collect()}
    assert a == b and len(a) == 200
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    # 90/5/5 within loose tolerance at n=200
    assert counts["train"] > 150 and set(counts) <= {"train", "val", "test"}


def test_stratified_sample_exact_k_and_stable(spark):
    d = _docs(spark)
    s1 = CP.stratified_sample(d, ["lang"], k=7, key_col="doc_id").collect()
    s2 = CP.stratified_sample(d, ["lang"], k=7, key_col="doc_id").collect()
    ids1 = sorted((r["lang"], r["doc_id"]) for r in s1)
    assert ids1 == sorted((r["lang"], r["doc_id"]) for r in s2)
    per = {}
    for lang, _ in ids1:
        per[lang] = per.get(lang, 0) + 1
    assert per == {"en": 7, "fr": 7}


def test_vocab_top_tokens(spark):
    d = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry banana")],
        "doc_id long, text string",
    )
    out = {r["token"]: r["n_occurrences"] for r in CP.vocab_top_tokens(d, "text", n=2).collect()}
    assert out == {"banana": 3, "apple": 2}


def test_decontaminate_overlap(spark):
    bench = spark.createDataFrame([(100, "alpha beta gamma delta")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # both 3-grams hit -> 1.0
            (2, "zig zag zoom boom pow"),          # no hits -> 0.0
            (3, "alpha beta gamma other words"),  # 1 of 3 grams hits
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CP.decontaminate(corpus, bench, n=3, threshold=0.5).collect()}
    assert out[1]["contaminated"] and out[1]["overlap_ratio"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_shingles"] == 3 and out[3]["n_hits"] == 1
    assert abs(out[3]["overlap_ratio"] - 0.3333) < 1e-9 and not out[3]["contaminated"]


def test_ivf_centroids_mean(spark):
    rows = [
        (1, [1.0, 2.0, 1.0, 1.0], 0),
        (2, [3.0, 4.0, 1.0, 1.0], 0),   # same signs -> same cell
        (3, [-1.0, -2.0, 1.0, 1.0], 0),  # different cell
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["cell"]: r for r in ivf_centroids(e, "embedding", bits=4, dims=4).collect()}
    both = [c for c, r in out.items() if r["n_vectors"] == 2]
    assert len(both) == 1
    assert out[both[0]]["centroid"] == [2.0, 3.0, 1.0, 1.0]
