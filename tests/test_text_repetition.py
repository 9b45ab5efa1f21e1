"""Gopher-style repetition signals: hand-computed expectations, including
the short-doc guards (Spark ``sequence(1, 0)`` counts DOWN — the n-gram
helper must emit empty arrays, not bogus ones)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.functions import text as TX  # noqa: E402


def _signals(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    t = df.select("id", TX.tokens("text").alias("toks"))
    g = t.select(
        "id",
        "toks",
        TX.token_ngrams("toks", 2).alias("bg"),
        TX.token_ngrams("toks", 3).alias("tg"),
    )
    sig = TX.repetition_signals("toks", "bg", "tg")
    rows = g.select("id", *[c.alias(n) for n, c in sig.items()]).orderBy("id").collect()
    return [(r["dup_token_frac"], r["top_bigram_frac"], r["dup_trigram_frac"]) for r in rows]


def test_repetition_values(spark):
    out = _signals(
        spark,
        [
            "a a a a",                    # pure repetition
            "the cat sat the cat ran",    # one repeated bigram, no repeated trigram
            "one two",                    # too short for trigrams
            "solo",                       # too short for bigrams
            "",                           # no tokens at all
        ],
    )
    assert out[0] == (0.75, 1.0, 0.5)
    assert out[1] == (round(2 / 6, 4), 0.4, 0.0)
    assert out[2] == (0.0, 1.0, None)
    assert out[3] == (0.0, None, None)
    assert out[4] == (None, None, None)


def test_token_ngrams_short_input_guard(spark):
    df = spark.createDataFrame([("x y",)], "text string")
    out = df.select(
        TX.token_ngrams(TX.tokens("text"), 3).alias("tg"),
        F.size(TX.token_ngrams(TX.tokens("text"), 2)).alias("n_bg"),
    ).first()
    assert out["tg"] == []
    assert out["n_bg"] == 1


def test_repetition_signals_match_python_hypothesis(spark):
    """Randomized Gopher repetition signals vs a Python loop over the
    same normalized token stream: dup-token fraction, top-bigram
    fraction, dup-trigram fraction — heavy repeats, all-unique docs,
    docs too short for the n-gram (NULL)."""
    from hypothesis import given, settings, strategies as st

    import pyspark.sql.functions as F

    from simpletasks_data_spark.functions import text as TX

    docs = st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )

    def half_up4(x):
        import math
        return math.floor(x * 1e4 + 0.5) / 1e4

    @given(docs)
    @settings(max_examples=8, deadline=None)
    def check(tok_lists):
        rows = [(i, " ".join(toks)) for i, toks in enumerate(tok_lists)]
        df = (
            spark.createDataFrame(rows, "id long, text string")
            .withColumn("toks", TX.tokens(F.col("text")))
            .withColumn("bg", TX.token_ngrams(F.col("toks"), 2))
            .withColumn("tg", TX.token_ngrams(F.col("toks"), 3))
        )
        sig = TX.repetition_signals("toks", "bg", "tg")
        out = df.select("id", *[c.alias(n) for n, c in sig.items()]).collect()
        got = {
            r["id"]: (r["dup_token_frac"], r["top_bigram_frac"], r["dup_trigram_frac"])
            for r in out
        }
        for i, toks in enumerate(tok_lists):
            n = len(toks)
            bg = [" ".join(toks[j:j + 2]) for j in range(max(0, n - 1))]
            tg = [" ".join(toks[j:j + 3]) for j in range(max(0, n - 2))]
            dup_tok = half_up4((n - len(set(toks))) / n) if n else None
            top_bg = (
                half_up4(max(bg.count(x) for x in set(bg)) / len(bg)) if bg else None
            )
            dup_tg = (
                half_up4((len(tg) - len(set(tg))) / len(tg)) if tg else None
            )
            assert got[i] == (dup_tok, top_bg, dup_tg), (i, toks, got[i])

    check()
