"""Single-pass data profiling: per-column stats for a whole table in ONE
aggregation job.

Not in the reference engine; profiling is the first step of any ingest /
training-data pipeline (schema drift, null explosions, cardinality checks),
so it joins the extension surface. The design constraint is the pass count:
a naive profiler runs one job per column (k scans of a 100 TB table); this
one computes every column's stats in a single ``agg`` — one scan, map-side
partials, a 1-row result that is then unpivoted driver-free with
``explode``.

Cardinality: ``approx=False`` uses exact ``countDistinct``; Catalyst plans
multiple distinct aggregates with an Expand (data volume x #columns between
the scan and the first shuffle) — exact but the expensive path.
``approx=True`` swaps in ``approx_count_distinct`` (HyperLogLog++), which
keeps the plan a plain one-pass partial agg with NO Expand — that's the
100 TB setting; the exact mode exists because it's oracle-checkable.

Output is long-format, one row per profiled column:
``col_name, n_rows, null_count, distinct_count, min_num, max_num
(numeric columns), min_str, max_str (string/timestamp columns, binary
collation), avg_len (string columns)``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["profile", "k_anonymity_report", "exact_group_median"]

_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")


def profile(df: DataFrame, columns: Sequence[str] | None = None, approx: bool = False) -> DataFrame:
    cols = list(columns) if columns is not None else list(df.columns)
    dtypes = dict(df.dtypes)

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        t = dtypes[c]
        aggs.append(F.count(c).cast("long").alias(f"_nn_{c}"))
        d = F.approx_count_distinct(c) if approx else F.countDistinct(c)
        aggs.append(d.cast("long").alias(f"_d_{c}"))
        if t.startswith(_NUMERIC_PREFIXES):
            aggs.append(F.round(F.min(c).cast("double"), 4).alias(f"_min_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), 4).alias(f"_max_{c}"))
        elif t in ("string", "timestamp", "timestamp_ntz", "date"):
            aggs.append(F.min(F.col(c).cast("string")).alias(f"_smin_{c}"))
            aggs.append(F.max(F.col(c).cast("string")).alias(f"_smax_{c}"))
        if t == "string":
            aggs.append(F.round(F.avg(F.length(c)), 4).alias(f"_len_{c}"))

    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    rows = []
    for c in cols:
        t = dtypes[c]
        num = t.startswith(_NUMERIC_PREFIXES)
        ordered = t in ("string", "timestamp", "timestamp_ntz", "date")
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("null_count"),
                F.col(f"_d_{c}").alias("distinct_count"),
                (F.col(f"_min_{c}") if num else null_d).alias("min_num"),
                (F.col(f"_max_{c}") if num else null_d).alias("max_num"),
                (F.col(f"_smin_{c}") if ordered else null_s).alias("min_str"),
                (F.col(f"_smax_{c}") if ordered else null_s).alias("max_str"),
                (F.col(f"_len_{c}") if t == "string" else null_d).alias("avg_len"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    ks: Sequence[int] = (2, 5, 10, 20),
) -> DataFrame:
    """Privacy-governance check before a dataset ships to training: group
    rows into equivalence classes on the quasi-identifier columns and
    report, for each candidate ``k``, how far the table is from
    k-anonymity — a record is re-identifiable when its quasi-identifier
    combination is shared by fewer than k rows.

    Returns one row per k: (k, n_classes, n_small_classes, rows_at_risk,
    risk_pct) where a "small" class has size < k; risk_pct is the
    at-risk row fraction rounded to 1e-4.

    Shape: ONE hash agg builds the class-size frame (the only pass over
    the table — the 100 TB cost); the per-k report is a tiny
    broadcast-k cross join + second agg over class sizes, not rows. The
    generalization loop of a full Mondrian anonymizer would iterate
    this exact report while coarsening the quasi-columns (bucketing
    numerics, truncating zips) — each iteration stays one scan.
    """
    sizes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("_sz")
    )
    kf = df.sparkSession.createDataFrame([(int(k),) for k in ks], "k long")
    return (
        sizes.crossJoin(F.broadcast(kf))  # b: param
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(F.when(F.col("_sz") < F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_small_classes"),
            F.sum(F.when(F.col("_sz") < F.col("k"), F.col("_sz")).otherwise(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.round(
                F.sum(F.when(F.col("_sz") < F.col("k"), F.col("_sz")).otherwise(0))
                / F.sum("_sz"),
                4,
            ).alias("risk_pct"),
        )
    )


def exact_group_median(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    bucket_width: int = 100000,
) -> DataFrame:
    """EXACT per-group lower median (the k-th order statistic with
    k = (n+1)//2) of an INTEGER value column, computed without ever
    sorting the data — the two-pass histogram-refinement pattern that
    replaces ``ORDER BY`` quantiles at scale (the exact sibling of the
    histogram sketch in operators/sketches.py).

    Pass 1: one hash agg to the (group, value div bucket_width)
    histogram; a cumulative window ordered by bucket runs PER GROUP
    over at most value_range/bucket_width rows — the GRID, never the
    data — and pinpoints each group's boundary bucket plus the residual
    rank inside it. Pass 2: rows are semi-joined to their group's one
    boundary bucket (a broadcastable group->bucket map: ONE row per
    group), aggregated to a (group, value) histogram — at most
    bucket_width rows per group — and the residual rank picks the exact
    value with a second grid-sized window. No stage ever holds a
    data-sized sort; ties need no break because duplicates collapse
    into histogram counts.

    Returns (group_cols..., n, median) with n and median as longs.
    """
    g = list(group_cols)
    v = F.col(value_col)
    h1 = df.groupBy(*g, (v - (v % bucket_width)).alias("_b")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wg = Window.partitionBy(*g).orderBy("_b")
    h1 = h1.withColumn("_cum", F.sum("_c").over(wg)).withColumn(
        "_before", F.col("_cum") - F.col("_c")
    )
    wt = Window.partitionBy(*g)
    h1 = h1.withColumn("_n", F.max("_cum").over(wt)).withColumn(
        "_k", F.expr("(_n + 1) div 2")
    )
    bound = (
        h1.where((F.col("_before") < F.col("_k")) & (F.col("_k") <= F.col("_cum")))
        .select(
            *g,
            F.col("_b").alias("_bb"),
            (F.col("_k") - F.col("_before")).cast("long").alias("_k2"),
            F.col("_n").cast("long").alias("n"),
        )
    )
    inb = df.join(F.broadcast(bound), g).where(  # b: grid
        (v - (v % bucket_width)) == F.col("_bb")
    )
    h2 = inb.groupBy(*g, v.alias("_v"), F.col("_k2"), F.col("n")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wv = Window.partitionBy(*g).orderBy("_v")
    h2 = h2.withColumn("_cum", F.sum("_c").over(wv)).withColumn(
        "_before", F.col("_cum") - F.col("_c")
    )
    out = h2.where(
        (F.col("_before") < F.col("_k2")) & (F.col("_k2") <= F.col("_cum"))
    )
    return out.select(*g, "n", F.col("_v").cast("long").alias("median"))
