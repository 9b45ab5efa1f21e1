"""Record linkage / entity resolution over structured tables.

``blocked_entity_pairs`` is the classic two-phase shape: a cheap BLOCKING
key bounds the quadratic candidate space (only records sharing a block
ever pair), then an edit-distance VERIFY keeps true near-matches. This is
the structured-records sibling of the text fuzzy-dedup family
(operators/dedupe.py) — same candidate-generation-then-verify design,
with string edit distance in place of Jaccard.

Scale shape: the self-join is an equi-join on the block key (shuffle
both sides on the block, no cross product across blocks), and the
per-block quadratic term is bounded by the block's size — at 100 TB you
size blocks the way LSH bands are sized (add discriminating columns,
sorted-neighborhood windows, or phonetic keys until the largest block is
~1k records). A length-difference pre-filter runs before the edit
distance (|len(a) - len(b)| > d implies distance > d), and Spark's
bounded ``levenshtein(l, r, threshold)`` form early-exits the DP once
the threshold is exceeded — both prune the verify cost, neither changes
the result.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_entity_pairs"]


def blocked_entity_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_distance: int = 1,
) -> DataFrame:
    """Pairs (id_a < id_b) sharing every ``block_cols`` value whose
    ``name_col`` edit distance is <= ``max_distance``. Output:
    (id_a, id_b, *block_cols, distance)."""
    block_cols = list(block_cols)
    base = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), *block_cols
    )
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_nm").alias("_nm_a"), *block_cols
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_nm").alias("_nm_b"), *block_cols
    )
    dist = F.levenshtein("_nm_a", "_nm_b", max_distance)
    return (
        a.join(b, block_cols)
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.length("_nm_a") - F.length("_nm_b")).between(
                -max_distance, max_distance
            )
        )
        .withColumn("distance", dist)
        .where(F.col("distance") >= 0)  # bounded form returns -1 past the cap
        .select("id_a", "id_b", *block_cols, F.col("distance").cast("long").alias("distance"))
    )
