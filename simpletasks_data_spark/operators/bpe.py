"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The canonical LLM-tokenizer construction (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016): start
from characters, repeatedly merge the most frequent adjacent symbol
pair. The trainer here runs the merge loop over a DISTINCT-WORD
frequency table (the standard optimization — pair counts weight by word
frequency, so the corpus is scanned once and each round touches only
the vocabulary-sized word frame).

Engine-exact distributed formulation:

- each word's symbol sequence is ONE string: symbols joined with a
  doubled separator and wrapped, ``"·a··b··c·"`` — the doubling makes a
  pair pattern ``"·x··y·"`` non-overlapping with its neighbors, so the
  engines' native left-to-right non-overlapping ``replace`` applies a
  merge EXACTLY like greedy BPE (e.g. ``"·a··a··a·"`` -> ``"·aa··a·"``,
  leftmost wins), and a pattern can never false-match across symbol
  boundaries (the char before a symbol's first char is always ``·``).
- pair counting: split the string back to the symbol array (map-side),
  zip adjacent elements, explode, ONE weighted hash agg per round.
- the argmax pair (count desc, then lexicographic — the determinism
  tie-break) is a 1-row collect: merge rules are DRIVER METADATA, like
  k-means centroids, and embed into the next round's replace expression
  as literals.

Scale shape: per round = one map-side split/zip/explode + one hash agg
on (x, y) + a top-1 reduce. The word frame re-checkpoints per round so
the plan stays flat. At 100 TB the word-frequency table is the only
corpus-sized shuffle (built once, up front); rounds run on the
vocabulary, which is sublinear in corpus size (Heaps' law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["symbolize", "bpe_train"]

SEP = "·"  # '·' — outside the [a-z0-9] token alphabet


def symbolize(word) -> "F.Column":
    """word -> wrapped doubled-separator symbol string: 'abc' ->
    '·a··b··c·'."""
    s = F.concat(F.lit(SEP), F.regexp_replace(word, "(.)", "$1" + SEP + SEP))
    return s.substr(F.lit(1), F.length(s) - 1)


def bpe_train(
    words: DataFrame,
    word_col: str = "word",
    weight_col: str = "wcount",
    merges: int = 5,
) -> DataFrame:
    """Learn ``merges`` BPE merge rules from a (word, frequency) table.

    Returns a DataFrame (step, lhs, rhs, freq): the merged pair per
    round and its weighted frequency at merge time.
    """
    spark = words.sparkSession
    df = words.select(
        symbolize(F.col(word_col)).alias("sym"), F.col(weight_col).alias("w")
    ).localCheckpoint(eager=True)
    learned: list[tuple[int, str, str, int]] = []
    for step in range(1, merges + 1):
        arr = F.split(F.trim(F.col("sym"), F.lit(SEP)), SEP + SEP)
        pairs = F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda a, b: F.struct(a.alias("x"), b.alias("y")),
        )
        p = (
            df.select(F.explode(pairs).alias("pr"), "w")
            .groupBy(F.col("pr.x").alias("x"), F.col("pr.y").alias("y"))
            .agg(F.sum("w").cast("long").alias("cnt"))
        )
        top = p.orderBy(F.desc("cnt"), F.asc("x"), F.asc("y")).limit(1).collect()  # c: 1row
        if not top:
            break
        x, y, cnt = top[0]["x"], top[0]["y"], int(top[0]["cnt"])
        learned.append((step, x, y, cnt))
        find = f"{SEP}{x}{SEP}{SEP}{y}{SEP}"
        repl = f"{SEP}{x}{y}{SEP}"
        df = df.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(find), F.lit(repl))
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(learned, "step long, lhs string, rhs string, freq long")
