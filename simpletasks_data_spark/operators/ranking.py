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

from typing import Mapping, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    # Lazy checkpoint: the counts collect below is the materializing
    # action (one job instead of two per call — r11; ~15 catalog queries
    # ride this kernel). The _pid values are assigned during that job
    # and FROZEN by the checkpoint, so the offset map and the window
    # read identical pids — the same guarantee the eager form had.
    ordered = (
        df.repartitionByRange(n_parts, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ordered.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()  # c: parts
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


def _global_running(
    df: DataFrame,
    order_by: Sequence,
    specs: Sequence[Tuple[str, str, str]],
    inclusive: bool,
    partition_by: Sequence[str],
    partitions: int | None,
) -> DataFrame:
    """Shared kernel for exact distributed running aggregates
    (``fn(c) OVER (ORDER BY order_by ROWS UNBOUNDED PRECEDING [AND -1])``)
    where ``specs`` is ``[(in_col, out_col, fn)]`` with fn in
    {sum, min, max} — every associative running agg without the
    partitionless ``WindowExec`` that funnels the whole frame through
    one task.

    Same discipline as :func:`global_row_number`: one range exchange on
    ``(partition_by..., order_by...)``, per-partition running aggs under
    a ``(_pid, partition_by...)`` window, then each partition's base is
    the fold of EARLIER partitions' group totals — O(partitions ×
    groups) driver metadata, stitched back via a broadcast equi-join
    (never a literal the size of the data). ``partition_by`` must be
    BOUNDED cardinality (folds, segments — not keys): the driver holds
    one row per (partition, group). ``order_by`` must be a strict total
    order within each group (the range exchange may split ties across
    partitions otherwise).
    """
    FNS = {"sum": F.sum, "min": F.min, "max": F.max}
    keys = [*partition_by, *order_by]
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    # Lazy checkpoint — the totals collect materializes it (one job per
    # call, not two); see the global_row_number note.
    ordered = (
        df.repartitionByRange(n_parts, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    gcols = ["_pid", *partition_by]
    totals = ordered.groupBy(*gcols).agg(
        *[FNS[fn](c).alias(f"_t_{out}") for c, out, fn in specs]
    )
    rows = totals.collect()  # c: parts

    def _fold(fn, a, b):
        if b is None:
            return a
        if a is None:
            return b
        if fn == "sum":
            return a + b
        return min(a, b) if fn == "min" else max(a, b)

    # fold of earlier partitions' totals, accumulated per group in
    # range-partition (= sort) order; None = empty prefix (SQL null)
    acc: dict = {}
    base_rows = []
    for r in sorted(rows, key=lambda r: r["_pid"]):
        g = tuple(r[c] for c in partition_by)
        cur = acc.setdefault(g, {out: None for _, out, _ in specs})
        base_rows.append(tuple([r["_pid"], *g, *[cur[out] for _, out, _ in specs]]))
        for c, out, fn in specs:
            cur[out] = _fold(fn, cur[out], r[f"_t_{out}"])
    if not base_rows:
        out_df = ordered.drop("_pid")
        for c, name, _ in specs:
            out_df = out_df.withColumn(
                name, F.lit(None).cast(ordered.schema[c].dataType)
            )
        return out_df
    base_schema = T.StructType(
        [totals.schema["_pid"]]
        + [totals.schema[c] for c in partition_by]
        + [
            T.StructField(f"_b_{out}", totals.schema[f"_t_{out}"].dataType)
            for _, out, _ in specs
        ]
    )
    bases = df.sparkSession.createDataFrame(base_rows, base_schema)
    hi = 0 if inclusive else -1
    w = Window.partitionBy(*gcols).orderBy(*order_by).rowsBetween(
        Window.unboundedPreceding, hi
    )

    def _merge(out, fn):
        r, b = F.col(f"_r_{out}"), F.col(f"_b_{out}")
        if fn == "sum":
            # empty frame + empty prefix stays SQL-null like the window
            return F.when(r.isNull() & b.isNull(), F.lit(None)).otherwise(
                F.coalesce(r, F.lit(0)) + F.coalesce(b, F.lit(0))
            )
        return F.least(r, b) if fn == "min" else F.greatest(r, b)

    run = ordered.select(
        "*", *[FNS[fn](c).over(w).alias(f"_r_{out}") for c, out, fn in specs]
    )
    joined = run.join(F.broadcast(bases), on=gcols, how="left")  # b: param
    return joined.select(
        *[c for c in df.columns],
        *[_merge(out, fn).alias(out) for _, out, fn in specs],
    )


def global_prefix_sum(
    df: DataFrame,
    order_by: Sequence,
    sum_cols: Mapping[str, str],
    partition_by: Sequence[str] = (),
    partitions: int | None = None,
) -> DataFrame:
    """Exact INCLUSIVE running sums (``sum(c) OVER (ORDER BY order_by
    ROWS UNBOUNDED PRECEDING)``) of each column in ``sum_cols``
    (``{input_col: output_col}``), optionally per ``partition_by``
    group. See :func:`_global_running` for the distributed shape."""
    return _global_running(
        df,
        order_by,
        [(c, out, "sum") for c, out in sum_cols.items()],
        True,
        partition_by,
        partitions,
    )


def global_running_min(
    df: DataFrame,
    order_by: Sequence,
    min_cols: Mapping[str, str],
    inclusive: bool = False,
    partition_by: Sequence[str] = (),
    partitions: int | None = None,
) -> DataFrame:
    """Exact running minimum over the total order — by default the
    EXCLUSIVE form (``min(c) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``, null on the first row), the shape the
    2-D skyline scan needs. See :func:`_global_running`."""
    return _global_running(
        df,
        order_by,
        [(c, out, "min") for c, out in min_cols.items()],
        inclusive,
        partition_by,
        partitions,
    )


def global_running_max(
    df: DataFrame,
    order_by: Sequence,
    max_cols: Mapping[str, str],
    inclusive: bool = False,
    partition_by: Sequence[str] = (),
    partitions: int | None = None,
) -> DataFrame:
    """Exact running maximum over the total order — by default the
    EXCLUSIVE form (``max(c) OVER (ORDER BY ... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``, null on the first row), the shape a
    gaps-and-islands sweep needs (new island when start > running max
    of earlier interval ends). See :func:`_global_running`."""
    return _global_running(
        df,
        order_by,
        [(c, out, "max") for c, out in max_cols.items()],
        inclusive,
        partition_by,
        partitions,
    )


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
    # per-partition first/last candidate (struct keeps (v, key) consistent).
    # BOTH directions run as GROWING frames (unboundedPreceding..-1):
    # Spark evaluates growing frames incrementally (O(rows)), but an
    # UnboundedFollowing frame re-scans current..end per row — O(rows^2)
    # per partition, measured 12.3s -> 4.4s on this operator at sf0.1
    # when the "next" side moved to last(ignorenulls) over the REVERSED
    # total order (values identical: the sort is a strict total order,
    # so "first non-null after me ascending" IS "last non-null before
    # me descending"). Costs one extra per-partition sort, O(n log n).
    cstruct = F.when(F.col("_typ") == 0, F.struct("_v", "_k"))
    wprev = Window.partitionBy("_pid").orderBy("_v", "_typ", "_k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wnext = Window.partitionBy("_pid").orderBy(
        F.desc("_v"), F.desc("_typ"), F.desc("_k")
    ).rowsBetween(Window.unboundedPreceding, -1)
    # O(partitions) boundary metadata -> carry maps (ONE collect)
    meta = (
        ordered.groupBy("_pid")
        .agg(
            F.min(F.when(F.col("_typ") == 0, F.struct("_v", "_k"))).alias("lo"),
            F.max(F.when(F.col("_typ") == 0, F.struct("_v", "_k"))).alias("hi"),
        )
        .collect()  # c: parts
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

    # carry struct type derives from the INPUT columns (ADVICE r5: a
    # hardcoded long/long literal mis-types int/string keys at analysis)
    carry_type = T.StructType(
        [
            T.StructField("_v", ordered.schema["_v"].dataType),
            T.StructField("_k", ordered.schema["_k"].dataType),
        ]
    )

    def _carry_expr(m):
        entries = []
        for pid, val in m.items():
            if val is not None:
                entries.extend(
                    [
                        F.lit(pid),
                        F.struct(
                            F.lit(val[0]).cast(carry_type["_v"].dataType).alias("_v"),
                            F.lit(val[1]).cast(carry_type["_k"].dataType).alias("_k"),
                        ),
                    ]
                )
        if not entries:
            return F.lit(None).cast(carry_type)
        return F.element_at(F.create_map(*entries), F.col("_pid"))

    # windows run over the FULL merged frame (controls must be visible
    # to the frame); only then do points filter out
    windowed = ordered.select(
        "_pid",
        "_typ",
        F.col("_k").alias("_pk"),
        F.col("_v").alias("_pv"),
        F.coalesce(F.last(cstruct, ignorenulls=True).over(wprev), _carry_expr(carry_prev)).alias("_prev"),
        F.coalesce(F.last(cstruct, ignorenulls=True).over(wnext), _carry_expr(carry_next)).alias("_next"),
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
