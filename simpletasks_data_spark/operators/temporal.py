"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of join and interval/range join.

Neither is in the reference engine (upOwa/simpletasks-data has no join
operators at all — its merge is a keyed upsert); both are table-stakes for
time-series work over event data, so they're part of the extension surface
(SURVEY.md §6). Implementations are Spark-first compositions of built-in
operators — no UDFs, no driver materialization.

``asof_join`` — for each left row, the latest right row with
``right_ts <= left_ts`` (per key, inclusive: DuckDB/pandas ``merge_asof``
"backward" semantics). Implemented with the union-sort trick: tag each
side, union by name, and carry the most recent right-side values forward
with ``last(..., ignorenulls=True)`` over a (key, ts, side) window. ONE
shuffle on the key — never a range cross-product — so it scales linearly:
at 100 TB this is a single hash exchange plus a per-partition sort,
exactly the plan a native ASOF JOIN (DuckDB, QuestDB) executes. Right
rows sort before left rows at equal ts so an exact-ts match is taken.

``range_join`` — pair left rows whose point column falls inside a right
row's [start, end] interval. With an equi-key this is just an equi-join
plus a range filter (Spark's optimizer handles it). WITHOUT an equi-key a
naive theta-join is a cross product; instead both sides are bucketed on a
fixed time grid — intervals explode into the buckets they cover, points
map to one bucket — turning it into an equi-join on bucket with a precise
residual filter. Bucket width trades replication (long intervals cover
many buckets) against bucket size; pick it near the median interval
length.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "interval_overlap_join"]

_SIDE = "_asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    values: Sequence[str],
    tolerance: Column | None = None,
    matched_ts: str | None = None,
) -> DataFrame:
    """Left as-of (backward, inclusive) join.

    Every ``left`` row gains the ``values`` columns of the most recent
    ``right`` row with ``right[right_ts] <= left[left_ts]`` and equal
    ``on`` keys, or NULLs if none exists. ``tolerance`` (an interval
    Column, e.g. ``F.expr("INTERVAL 7 DAYS")``) NULLs matches older than
    ``left_ts - tolerance``. ``matched_ts`` names an output column holding
    the matched right timestamp.

    Right rows must be unique per (on, right_ts) for deterministic output
    — pre-aggregate the right side if they aren't.
    """
    on = list(on)
    values = list(values)
    ts_out = matched_ts or "_asof_matched_ts"

    # Union by name: right rows carry (key, ts, values); left rows carry
    # everything else. side=0 sorts right rows first at equal ts, making
    # the match inclusive.
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(ts_out),
        *[F.col(v) for v in values],
    )
    l = left.select(
        "*",
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r.schema[ts_out].dataType).alias(ts_out),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried: List[Column] = [F.last(ts_out, ignorenulls=True).over(w).alias(ts_out)]
    for v in values:
        carried.append(F.last(v, ignorenulls=True).over(w).alias(v))

    keep = [c for c in left.columns]
    out = (
        u.select(*keep, F.col(_SIDE), *carried)
        .where(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )
    if tolerance is not None:
        ok = F.col(ts_out) >= (F.col(left_ts) - tolerance)
        out = out.select(
            *keep,
            F.when(ok, F.col(ts_out)).alias(ts_out),
            *[F.when(ok, F.col(v)).alias(v) for v in values],
        )
    if matched_ts is None:
        out = out.drop(ts_out)
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: Sequence[str] = (),
    bucket: str | None = "7 days",
    how: str = "inner",
) -> DataFrame:
    """Join point rows into [start, end] intervals (inclusive bounds).

    With ``on`` keys the equi-join carries the range predicate as a
    post-join filter — Spark plans a hash join, no cross product. Without
    keys (or with very hot keys) set ``bucket`` to a grid width: intervals
    are exploded into each grid cell they overlap via ``sequence()``, the
    join becomes an equi-join on (keys..., cell), and the exact range
    filter runs after. An interval spanning B buckets is replicated B
    times — bounded, unlike the unbounded fan of a broadcast-nested-loop.
    """
    on = list(on)
    cond = (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    if bucket is None:
        joined = points.join(intervals, on, how) if on else points.crossJoin(intervals)
        return joined.where(cond)

    import pandas as pd

    width_s = int(pd.Timedelta(bucket).total_seconds())
    cell_of = lambda c: F.floor(  # noqa: E731 — grid cell index of a timestamp
        F.unix_timestamp(c) / F.lit(width_s)
    )
    iv = intervals.withColumn(
        "_cell",
        F.explode(F.sequence(cell_of(F.col(start_ts)), cell_of(F.col(end_ts)))),
    )
    pt = points.withColumn("_cell", cell_of(F.col(point_ts)))
    return pt.join(iv, on + ["_cell"], how).where(cond).drop("_cell")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Sequence[str] = (),
    bucket: str = "7 days",
) -> DataFrame:
    """Pair rows whose [start, end] intervals OVERLAP (inclusive bounds)
    — the interval-interval sibling of ``range_join``'s point-interval
    form, the primitive behind time-range dedup, concurrent-session
    detection, and conflict checks.

    Both sides explode onto the same fixed grid; a pair can share many
    cells, so the join keeps exactly ONE copy by emitting a pair only
    from the FIRST cell both intervals cover (``greatest`` of the two
    start cells — computable per row pair, no distinct pass, the same
    dedup trick as the LSH band join). Replication is bounded by
    interval length / bucket width per side; the exact overlap predicate
    (``l_start <= r_end AND r_start <= l_end``) runs as a residual
    filter after the cell equi-join."""
    import pandas as pd

    on = list(on)
    width_s = int(pd.Timedelta(bucket).total_seconds())
    cell_of = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(c) / F.lit(width_s)
    )
    l = left.withColumn("_lc0", cell_of(F.col(left_start))).withColumn(
        "_cell", F.explode(F.sequence(cell_of(F.col(left_start)), cell_of(F.col(left_end))))
    )
    r = right.withColumn("_rc0", cell_of(F.col(right_start))).withColumn(
        "_cell", F.explode(F.sequence(cell_of(F.col(right_start)), cell_of(F.col(right_end))))
    )
    overlap = (F.col(left_start) <= F.col(right_end)) & (
        F.col(right_start) <= F.col(left_end)
    )
    first_shared = F.greatest(F.col("_lc0"), F.col("_rc0")) == F.col("_cell")
    return (
        l.join(r, on + ["_cell"])
        .where(overlap & first_shared)
        .drop("_cell", "_lc0", "_rc0")
    )


def calendar_forward_fill(
    obs: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    count_col: str | None = None,
) -> DataFrame:
    """Gap-fill a per-(key, day) observation frame onto the DENSE global
    calendar and forward-fill the value — the time-series densification
    step behind "last known state per day" reports (price carried
    forward, inventory positions, slowly-updating metrics). Days before
    a key's first observation stay NULL (nothing to carry).

    Returns (key, day, n_obs, <value_col>_ff): n_obs is a per-day FACT
    and zero-fills on gap days (``count_col`` if given, else a 0/1
    observed flag); only the value column forward-fills.

    Scale shape: the calendar bounds are ONE global min/max agg (single
    row); the dense frame is calendar x keys — an explode of a
    sequence() against the broadcast key list, never a shuffle of the
    observation data; observations left-join on (key, day) (one
    shuffle); the forward fill is last_value IGNORE NULLS over
    (key, day-ordered) — one window pass that rides the same (key)
    partitioning. Total: one shuffle of calendar-sized (not
    observation-sized) rows plus the observation join.
    """
    bounds = obs.agg(
        F.min(day_col).alias("_dmin"), F.max(day_col).alias("_dmax")
    )
    keys = obs.select(F.col(key_col)).distinct()
    calendar = (
        keys.crossJoin(F.broadcast(bounds))  # b: 1row
        .select(
            key_col,
            F.explode(F.sequence(F.col("_dmin"), F.col("_dmax"))).alias(day_col),
        )
    )
    joined = calendar.join(obs, [key_col, day_col], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(
        f"{value_col}_ff", F.last(value_col, ignorenulls=True).over(w)
    )
    n_obs = (
        F.coalesce(F.col(count_col), F.lit(0)).cast("long")
        if count_col
        else F.when(F.col(value_col).isNull(), F.lit(0)).otherwise(F.lit(1)).cast("long")
    )
    return out.select(key_col, day_col, n_obs.alias("n_obs"), f"{value_col}_ff")
