"""Explicit Bloom-filter semi-join reduction.

Spark's optimizer injects runtime bloom filters on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default) but
only when its creation-side heuristics fire, and never across separately
materialized pipelines (e.g. a filter built in one job, reused in many).
``bloom_semi_join`` makes the pattern an explicit, composable operator:

1. Build-side: the small frame's keys hash to k md5-derived bit
   positions in an m-bit space; each hash's DISTINCT position set is a
   frame of at most m integers — broadcastable even when the distinct
   key set itself is too wide/large to broadcast (positions are bounded
   ints; keys may be long strings).
2. Probe-side: the large frame passes through k broadcast-hash SEMI
   joins (one per hash function) — a single pipelined stage, NO shuffle
   of the large side, rows failing any position drop immediately.
3. Verify: an exact semi join on the true key over the surviving rows
   removes bloom false positives — results are exactly the plain semi
   join, but the shuffle (if the exact join needs one) moves only the
   pre-filtered fraction.

At 100 TB the win is shuffle volume: with selectivity s and FP rate p,
the exact join shuffles (s + p) of the fact table instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_semi_join"]


def _pos(col: Column, seed: int, m_bits: int) -> Column:
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"b{seed}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Rows of ``large`` whose ``large_key`` appears in ``small``'s
    ``small_key`` (default: same name) — exact semi-join semantics with a
    bloom pre-filter doing the heavy lifting."""
    small_key = small_key or large_key
    filtered = large
    for i in range(k):
        positions = (
            small.select(_pos(F.col(small_key), i, m_bits).alias("_p")).distinct()
        )
        filtered = filtered.join(
            F.broadcast(positions),  # b: param
            _pos(F.col(large_key), i, m_bits) == F.col("_p"),
            "semi",
        )
    keys = small.select(F.col(small_key).alias(large_key)).distinct()
    return filtered.join(keys, [large_key], "semi")
