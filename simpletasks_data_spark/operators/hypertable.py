"""Hypertable-style multi-granularity rollup (continuous-aggregate shape).

``hypertable_rollup`` aggregates raw rows ONCE at the finest grain, then
derives every grain from those partial aggregates — the TimescaleDB
continuous-aggregate / materialized-rollup execution shape. At 100 TB
this is the difference between one full scan + a tiny partial-combine
stage and G full scans for G grains: the post-fine stages read ~raw/900
rows, not raw.

Execution shape (verified — Spark does NOT reuse exchanges across union
branches, so a naive per-grain union recomputes the raw scan per grain):

    raw scan -> fine partial agg        (shuffle 1, map-side combined)
             -> explode G (grain, coarser-bucket) structs per fine row
             -> one merge agg over (grain, bucket, keys)   (shuffle 2)

Two shuffles and one raw scan for any number of grains.

Measures must be decomposable (sum/count/min/max and compositions); the
caller supplies ``partial`` (aggregates over raw rows) and ``merge``
(same-named aggregates over the partial columns), plus an optional
``finalize`` projection per output row (rounding, avg = sum/count).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.timeseries import time_bucket, width_seconds

__all__ = ["hypertable_rollup"]

_BUCKET = "bucket_ts"


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    grains: Sequence[str],
    partial: Dict[str, Column],
    merge: Dict[str, Column],
    finalize: Dict[str, Column] | None = None,
    grain_col: str = "grain",
) -> DataFrame:
    """One row per (grain label, bucket, keys) with the finalized
    measures, for every grain in ``grains``. ``grains`` must be
    fine→coarse with each coarser width an exact multiple of the finest
    (so the grids nest and re-bucketing fine buckets is exact)."""
    keys = list(keys)
    widths = [width_seconds(g) for g in grains]
    for i, w in enumerate(widths[1:], 1):
        if w % widths[0] != 0 or w <= widths[i - 1]:
            raise ValueError(
                f"grains must be fine->coarse and nest on the finest grid: {grains!r}"
            )

    fine = (
        df.withColumn(_BUCKET, time_bucket(grains[0], F.col(ts_col)))
        .groupBy(*keys, _BUCKET)
        .agg(*[c.alias(n) for n, c in partial.items()])
    )
    # One pass over the fine partials: each row fans out to every grain
    # with its coarser bucket. An array-of-structs explode, NOT a per-
    # grain union — unions re-run the whole fine subtree per branch.
    fanout = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(g).alias("g"),
                    time_bucket(g, F.col(_BUCKET)).alias("b"),
                )
                for g in grains
            ]
        )
    )
    exploded = fine.withColumn("_fan", fanout).select(
        F.col("_fan.g").alias(grain_col),
        F.col("_fan.b").alias(_BUCKET),
        *keys,
        *partial.keys(),
    )
    rolled = exploded.groupBy(grain_col, _BUCKET, *keys).agg(
        *[c.alias(n) for n, c in merge.items()]
    )
    fin = finalize or {n: F.col(n) for n in partial}
    return rolled.select(
        grain_col, _BUCKET, *keys, *[c.alias(n) for n, c in fin.items()]
    )
