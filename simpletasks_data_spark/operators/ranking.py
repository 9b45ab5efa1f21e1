"""Distributed exact total-order ranking — the scale-safe replacement for
bare ``Window.orderBy`` (which funnels the ENTIRE frame through one task;
Spark even warns ``WindowExec: No Partition Defined``).

The shape (shared with queries.corpus_global_shuffle): RangePartitioning
on the sort key (sampled split points — the same exchange a global sort
uses), per-partition ``row_number`` over the in-partition sort, then the
zipWithIndex trick: global position = in-partition rank + the prefix sum
of earlier partitions' counts. Range partitions are ordered and disjoint,
so this IS the exact global rank; the per-partition counts are
O(partitions) driver metadata — the pattern's one legitimate collect.

``exact_ntile`` derives SQL ``ntile(n)`` from that rank in closed form
(first ``N mod n`` buckets get ``ceil(N/n)`` rows, the rest ``floor``),
so equal-frequency binning / quintile scoring / z-order bucketing keep
exact, engine-identical cuts WITHOUT a single-partition sort. Requires a
strict total order (include a unique tie-break column) — equal rows may
otherwise straddle a range boundary.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(
    df: DataFrame,
    order_by: Sequence,
    out_col: str = "position",
    partitions: int | None = None,
) -> Tuple[DataFrame, int]:
    """Exact 1-based global rank under ``order_by`` (columns or Column
    sort expressions forming a STRICT total order). Returns (frame with
    ``out_col`` appended, total row count). One range exchange + one
    per-partition window; no single-partition stage."""
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(n_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:  # empty frame
        return ordered.withColumn(out_col, F.lit(None).cast("long")).drop("_pid"), 0
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]),
        F.col("_pid"),
    )
    wp = Window.partitionBy("_pid").orderBy(*order_by)
    out = ordered.withColumn(
        out_col, (F.row_number().over(wp) + off_expr).cast("long")
    ).drop("_pid")
    return out, acc


def exact_ntile(
    df: DataFrame,
    n: int,
    order_by: Sequence,
    out_col: str = "bucket",
    partitions: int | None = None,
) -> DataFrame:
    """SQL ``ntile(n) OVER (ORDER BY order_by)`` with the distributed
    exact-rank plan: rank r maps to bucket ``ceil(r/(q+1))`` inside the
    first ``m*(q+1)`` rows and ``m + ceil((r-head)/q)`` after, where
    ``q, m = divmod(N, n)`` — bit-identical to the window function, so
    oracles are unchanged, but the sort is a sampled range exchange
    instead of one task holding the whole frame."""
    ranked, total = global_row_number(df, order_by, "_gr", partitions)
    q, m = divmod(total, n)
    head = m * (q + 1)
    r = F.col("_gr")
    if q == 0:
        # fewer rows than buckets: each row is its own bucket
        bucket = r
    else:
        bucket = F.when(
            r <= head, F.expr(f"(_gr - 1) div {q + 1}") + 1
        ).otherwise(F.lit(m) + F.expr(f"(_gr - 1 - {head}) div {q}") + 1)
    return ranked.withColumn(out_col, bucket.cast("long")).drop("_gr")
