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


def test_weighted_sample_extremes(spark):
    d = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    kept_all = CP.weighted_sample(d.withColumn("w", F.lit(1.0)), F.col("w"), F.col("doc_id"))
    kept_none = CP.weighted_sample(d.withColumn("w", F.lit(0.0)), F.col("w"), F.col("doc_id"))
    assert kept_all.count() == 100
    assert kept_none.count() == 0
    # determinism: same frame sampled twice -> identical ids
    half = d.withColumn("w", F.lit(0.5))
    a = sorted(r["doc_id"] for r in CP.weighted_sample(half, F.col("w"), F.col("doc_id")).collect())
    b = sorted(r["doc_id"] for r in CP.weighted_sample(half, F.col("w"), F.col("doc_id")).collect())
    assert a == b and 20 <= len(a) <= 80


def test_balance_mixture_exact_quotas(spark):
    rows = [(i, "en" if i < 60 else ("fr" if i < 90 else "de")) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    out = CP.balance_mixture(d, "lang", {"en": 0.5, "fr": 0.3, "de": 0.2}, key_col="doc_id")
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # scale = min(60/.5, 30/.3, 10/.2) = 50 -> quotas en=25, fr=15, de=10
    assert got == {"en": 25, "fr": 15, "de": 10}


def test_passage_dedupe_first_occurrence_keeps(spark):
    from simpletasks_data_spark.operators import dedupe as DD

    seg = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    uniq = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    rows = [
        (1, f"{seg} {uniq}"),          # owns the shared segment (min id)
        (2, f"{seg} x1 x2 x3"),        # loses it; keeps the 3-token tail
        (3, "y1 y2"),                   # single short segment, unshared
    ]
    d = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in DD.passage_dedupe(d, "id", "text").collect()}
    assert (out[1]["n_segments"], out[1]["n_shared_segments"]) == (2, 1)
    assert out[1]["n_kept_tokens"] == 20        # owner keeps everything
    assert (out[2]["n_segments"], out[2]["n_shared_segments"]) == (2, 1)
    assert out[2]["n_tokens"] == 13 and out[2]["n_kept_tokens"] == 3
    assert out[3]["shared_fraction"] == 0.0 and out[3]["n_kept_tokens"] == 2


def test_temperature_mixture_alpha_extremes(spark):
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    # alpha=1: natural distribution is already feasible -> keeps ~everything
    a1 = CP.temperature_mixture(d, "lang", alpha=1.0, key_col="doc_id")
    got1 = {r["lang"]: r["n"] for r in a1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got1 == {"big": 90, "small": 10}
    # alpha=0: uniform targets -> feasibility pinned by the smallest group
    a0 = CP.temperature_mixture(d, "lang", alpha=0.0, key_col="doc_id")
    got0 = {r["lang"]: r["n"] for r in a0.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got0 == {"big": 10, "small": 10}
    # 0 < alpha < 1 sits strictly between
    ah = CP.temperature_mixture(d, "lang", alpha=0.5, key_col="doc_id")
    goth = {r["lang"]: r["n"] for r in ah.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert goth["small"] == 10 and 10 < goth["big"] < 90


def test_passage_dedupe_invariants_hypothesis(spark):
    """Property pins for passage_dedupe over arbitrary word-salad corpora:
    token totals are conserved, the owner (smallest id per shared hash)
    keeps everything it owns, kept <= total, and shared_fraction is
    consistent with the counts."""
    from hypothesis import given, settings, strategies as st

    from simpletasks_data_spark.operators import dedupe as DD

    words = st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=35)
    corpora = st.lists(words, min_size=1, max_size=6)

    @settings(max_examples=8, deadline=None)
    @given(corpora)
    def run(texts):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
        d = spark.createDataFrame(rows, "id long, text string")
        out = DD.passage_dedupe(d, "id", "text").collect()
        assert len(out) == len(rows)
        for r in out:
            ws = texts[r["id"]]
            assert r["n_tokens"] == len(ws)
            assert 0 <= r["n_kept_tokens"] <= r["n_tokens"]
            assert r["n_shared_segments"] <= r["n_segments"]
            assert r["shared_fraction"] == round(r["n_shared_segments"] / r["n_segments"], 4)
        # global conservation: every shared segment is kept by exactly one
        # doc, so sum(kept) + sum(dropped) == sum(total) and dropped > 0
        # only when some segment is shared
        total = sum(r["n_tokens"] for r in out)
        kept = sum(r["n_kept_tokens"] for r in out)
        any_shared = any(r["n_shared_segments"] > 0 for r in out)
        assert kept <= total and (kept == total) == (not any_shared)

    run()


def test_suffix_ranks_banana(spark):
    """banana: suffix order a < ana < anana < banana < na < nana gives
    dense window-ranks identical to a direct suffix sort."""
    from simpletasks_data_spark.operators.corpus import suffix_ranks

    df = spark.createDataFrame([(1, "banana")], "doc_id long, s string")
    got = {r["pos"]: r["rank"] for r in suffix_ranks(df, "doc_id", "s", window=8).collect()}
    # suffixes by pos: 1 banana, 2 anana, 3 nana, 4 ana, 5 na, 6 a
    # sorted: a(6)=1, ana(4)=2, anana(2)=3, banana(1)=4, na(5)=5, nana(3)=6
    assert got == {6: 1, 4: 2, 2: 3, 1: 4, 5: 5, 3: 6}

    # two docs: equal windows share a rank (the dedup census property)
    df2 = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd"), (3, "zbcd")], "doc_id long, s string"
    )
    rows = suffix_ranks(df2, "doc_id", "s", window=4).collect()
    by_key = {(r["doc_id"], r["pos"]): r["rank"] for r in rows}
    assert by_key[(1, 1)] == by_key[(2, 1)]        # 'abcd' == 'abcd'
    assert by_key[(1, 2)] == by_key[(3, 2)]        # 'bcd' shared
    assert by_key[(1, 1)] != by_key[(3, 1)]        # 'abcd' != 'zbcd'
