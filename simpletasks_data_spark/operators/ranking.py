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


def nearest_in_1d(
    points: DataFrame,
    candidates: DataFrame,
    key_col: str = "key",
    value_col: str = "v",
    max_gap: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed EXACT 1-D nearest-neighbor: for every point, the
    nearest candidate by |value gap| on an integer value axis — the
    sorted-merge matching kernel (propensity matching, price banding,
    snap-to-grid). A bucket equi-join degenerates quadratically when
    values CONCENTRATE (every row lands in one bucket — observed 383 s
    at sf0.1 for propensity scores); the sorted-merge is O(n log n)
    regardless of the distribution.

    Ties are deterministic: candidates collapse to one representative
    per distinct value (min key), and an equidistant lower/higher
    neighbor resolves to the LOWER value side.

    Shape: one range exchange over the merged (candidates + points)
    frame sorted by (value, role, key) — the sanctioned distributed
    total order — then per-PARTITION prev/next windows; partition
    boundaries are stitched with an O(partitions) driver-held carry map
    (the zipWithIndex discipline: the driver holds partition metadata,
    never data). No single-partition stage at any size.

    Returns (``key_col``, match_key, match_v, gap).
    """
    reps = candidates.groupBy(F.col(value_col).alias("_v")).agg(
        F.min(key_col).alias("_ck")
    )
    merged = reps.select(
        "_v", F.lit(0).alias("_typ"), F.col("_ck").alias("_k")
    ).unionByName(
        points.select(
            F.col(value_col).alias("_v"),
            F.lit(1).alias("_typ"),
            F.col(key_col).alias("_k"),
        )
    )
    n_parts = partitions or points.sparkSession.sparkContext.defaultParallelism
    ordered = (
        merged.repartitionByRange(n_parts, "_v", "_typ", "_k")
        .sortWithinPartitions("_v", "_typ", "_k")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-partition first/last candidate (struct keeps (v, key) consistent)
    cstruct = F.when(F.col("_typ") == 0, F.struct("_v", "_k"))
    wprev = Window.partitionBy("_pid").orderBy("_v", "_typ", "_k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wnext = Window.partitionBy("_pid").orderBy("_v", "_typ", "_k").rowsBetween(
        1, Window.unboundedFollowing
    )
    # O(partitions) boundary metadata -> carry maps (ONE collect)
    meta = (
        ordered.groupBy("_pid")
        .agg(
            F.min(F.when(F.col("_typ") == 0, F.struct("_v", "_k"))).alias("lo"),
            F.max(F.when(F.col("_typ") == 0, F.struct("_v", "_k"))).alias("hi"),
        )
        .collect()
    )
    edges = {r["_pid"]: (r["lo"], r["hi"]) for r in meta if r["lo"] is not None}
    pids = sorted(r["_pid"] for r in meta)
    carry_prev, carry_next, last_seen = {}, {}, None
    for pid in pids:
        carry_prev[pid] = last_seen
        if pid in edges:
            last_seen = tuple(edges[pid][1])
    nxt_seen = None
    for pid in reversed(pids):
        carry_next[pid] = nxt_seen
        if pid in edges:
            nxt_seen = tuple(edges[pid][0])

    def _carry_expr(m):
        entries = []
        for pid, val in m.items():
            if val is not None:
                entries.extend(
                    [F.lit(pid), F.struct(F.lit(val[0]).alias("_v"), F.lit(val[1]).alias("_k"))]
                )
        if not entries:
            return F.lit(None).cast("struct<_v:long,_k:long>")
        return F.element_at(F.create_map(*entries), F.col("_pid"))

    # windows run over the FULL merged frame (controls must be visible
    # to the frame); only then do points filter out
    windowed = ordered.select(
        "_pid",
        "_typ",
        F.col("_k").alias("_pk"),
        F.col("_v").alias("_pv"),
        F.coalesce(F.last(cstruct, ignorenulls=True).over(wprev), _carry_expr(carry_prev)).alias("_prev"),
        F.coalesce(F.first(cstruct, ignorenulls=True).over(wnext), _carry_expr(carry_next)).alias("_next"),
    )
    out = windowed.where(F.col("_typ") == 1)
    gap_prev = F.col("_pv") - F.col("_prev._v")
    gap_next = F.col("_next._v") - F.col("_pv")
    use_prev = F.col("_prev").isNotNull() & (
        F.col("_next").isNull() | (gap_prev <= gap_next)
    )
    picked = out.select(
        "_pk",
        "_pv",
        F.when(use_prev, F.col("_prev")).otherwise(F.col("_next")).alias("_m"),
    ).where(F.col("_m").isNotNull())
    gap = F.abs(F.col("_pv") - F.col("_m._v"))
    res = picked.select(
        F.col("_pk").alias(key_col),
        F.col("_m._k").alias("match_key"),
        F.col("_m._v").alias("match_v"),
        gap.alias("gap"),
    )
    if max_gap is not None:
        res = res.where(F.col("gap") <= max_gap)
    return res
