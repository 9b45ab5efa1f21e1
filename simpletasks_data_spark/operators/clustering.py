"""Distributed k-means (Lloyd's) over embedding columns.

The reference has no clustering surface (SURVEY §2.6 scope boundary);
this is part of the LLM-training-data extension set: corpus topic
bucketing, quota-balanced sampling by cluster, and the coarse codebook
for a learned IVF index (``similarity.knn_ivf_signbits``'s sign-bit cells
replaced by trained centroids) all reduce to k-means assignments.

Execution model — the standard distributed Lloyd's split (what Spark
MLlib's KMeans does, re-expressed on DataFrames):

- **centroids live on the driver** (k x dims doubles — metadata, not
  data; SCALING.md principle 5), folded into the assignment expression
  as array literals so scoring is pure whole-stage codegen: no UDF, no
  shuffle, no broadcast join.
- **each round is ONE hash aggregation** over the (id, vec) projection:
  map-side partials collapse every partition to <= k rows of (count,
  64 per-dim sums), the only shuffle moves k x partitions tiny rows.
- the (id, vec) projection is checkpointed once up front so the T
  rounds re-scan a materialized columnar frame, not the source plan
  (at 100 TB: a cached/checkpointed parquet projection, scanned T
  times — Lloyd's is T sequential jobs by nature, the driver barrier
  IS the algorithm).

Determinism contract (what makes an unrolled-CTE SQL oracle land on
identical bytes — the same trick as ``graph.pagerank``):

- init: centroids = the embeddings of the ``k`` smallest-id vectors,
  elements rounded to the 1e-6 grid (decimal HALF_UP, matching
  Spark/DuckDB ``round``);
- assignment: squared L2 distance rounded to the 1e-4 grid, argmin with
  centroid-id tie-break (``array_min`` over (d2_r, cid) structs —
  struct ordering is lexicographic);
- update: each new centroid element is computed from an INTEGER
  sufficient statistic — per-row components quantize to nano-units
  (``floor(x*1e9 + 0.5)``, the identical IEEE op in every engine), sum
  exactly (DECIMAL(38,0) here / HUGEINT in DuckDB), and divide once on
  the driver before the 1e-6 rounding — so the trajectory is fully
  independent of partitioning and summation order (the same pattern as
  ``queries._logreg_gd_multi`` / ``graph.pagerank``); an empty cluster
  keeps its previous centroid.
"""

from __future__ import annotations

import decimal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import as_double

__all__ = ["kmeans_lloyd", "kmeans_report", "pca_power_top1"]


def _round_half_up(x: float, digits: int) -> float:
    """Driver-side twin of Spark's round(): decimal HALF_UP over the
    shortest decimal representation (see similarity.knn_bruteforce_blas
    for why repr, not the exact binary expansion)."""
    q = decimal.Decimal(1).scaleb(-digits)
    return float(decimal.Decimal(repr(float(x))).quantize(q, rounding=decimal.ROUND_HALF_UP))


def _qnano(c: Column) -> Column:
    """Per-row nano-unit quantization for integer sufficient statistics:
    ``floor(x*1e9 + 0.5)`` is the identical IEEE double op in every
    engine, and the DECIMAL(38,0) sum is exact — so a statistic built
    from these sums is independent of partitioning / summation order
    (mirrors the oracle's ``floor(x*1e9 + 0.5)`` BIGINT/HUGEINT sum;
    same pattern as queries._logreg_gd_multi)."""
    return F.floor(c * F.lit(1000000000.0) + F.lit(0.5)).cast("decimal(38,0)")


def _d2(vec: Column, cen: list[float]) -> Column:
    lit = F.array(*[F.lit(float(c)) for c in cen])
    sq = F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)


def _assign(base: DataFrame, cents: list[list[float]]) -> DataFrame:
    """(id, vec) -> (id, vec, cluster_id, d2_r): nearest centroid by
    1e-4-rounded squared L2, ties to the smaller centroid id."""
    cand = F.array(
        *[
            F.struct(
                F.round(_d2(F.col("vec"), cen), 4).alias("d2_r"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cen in enumerate(cents)
        ]
    )
    best = F.array_min(cand)
    return base.withColumn("cluster_id", best["cid"]).withColumn("d2_r", best["d2_r"])


def kmeans_lloyd(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
    dims: int = 64,
) -> tuple[DataFrame, list[list[float]]]:
    """Run ``iterations`` Lloyd rounds; return (assignments, centroids).

    assignments: (id, vec, cluster_id, d2_r) — the FINAL assignment,
    scored against the second-to-last centroids (the ones that produced
    it). centroids: the final updated k x dims list (1e-6 grid).

    The per-round centroid is an exact integer sufficient statistic
    (r8 verdict item 3, closing the r6 accepted-ULP note): each member
    component quantizes per-row to nano-units, the DECIMAL(38,0) sums
    are exact, and the mean is one driver-side division before the
    1e-6 rounding — the trajectory cannot depend on partitioning or
    summation order (the logreg/pagerank pattern).
    """
    base = emb.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("vec")
    ).localCheckpoint(eager=True)
    init_rows = base.orderBy("id").limit(k).select("vec").collect()  # c: topk
    if not init_rows:
        # degenerate-input guard (r8 empty-corpus sweep): zero vectors
        # would otherwise surface as an opaque analyzer error downstream
        raise ValueError("kmeans_lloyd: empty embedding frame")
    cents = [[_round_half_up(x, 6) for x in r["vec"]] for r in init_rows]
    assigned = None
    for _ in range(iterations):
        assigned = _assign(base, cents)
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(_qnano(F.element_at(F.col("vec"), d + 1))).alias(f"s{d}")
            for d in range(dims)
        ]
        rows = {
            r["cluster_id"]: [
                _round_half_up(float(r[f"s{d}"]) / r["n"] / 1e9, 6)
                for d in range(dims)
            ]
            for r in assigned.groupBy("cluster_id").agg(*aggs).collect()  # c: topk
        }
        cents = [rows.get(cid, cen) for cid, cen in enumerate(cents)]
    return assigned, cents


def kmeans_report(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
    dims: int = 64,
) -> DataFrame:
    """Per-cluster summary: (cluster_id, n_members, inertia, centroid).

    inertia = sum of the grid-rounded squared distances of the final
    assignment (vs the centroids that produced it, the conventional
    Lloyd objective); centroid = the final updated centroid, emitted at
    the operator's own 1e-6 grid — re-rounding coarser would DOUBLE-
    round: grid values sit exactly on .5 boundaries of any coarser
    grid, where engines legitimately disagree (binary-exact vs
    shortest-repr ties). +0.0 normalizes IEEE -0.0 for portable
    hashing.
    """
    assigned, cents = kmeans_lloyd(emb, id_col, vec_col, k, iterations, dims)
    rep = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.sum("d2_r"), 4).alias("inertia"),
    )
    cent_rows = [(cid, [x + 0.0 for x in cen]) for cid, cen in enumerate(cents)]
    cent_df = rep.sparkSession.createDataFrame(cent_rows, "cluster_id long, centroid array<double>")
    return rep.join(F.broadcast(cent_df), "cluster_id").select(  # b: topk
        "cluster_id", "n_members", "inertia", "centroid"
    )


def pca_power_top1(
    emb: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 8,
    dims: int = 64,
) -> tuple[list[float], float, float]:
    """Top principal component by distributed power iteration.

    Returns (component, eigenvalue, variance_share): the dominant
    eigenvector of the centered covariance (1e-6 grid), its eigenvalue
    estimate (||X^T X v|| / n), and the fraction of total variance it
    explains.

    Execution model mirrors :func:`kmeans_lloyd`: the mean vector and
    the running eigenvector live on the driver (dims-sized metadata)
    and fold into each round's aggregation as literals; every round is
    ONE hash agg computing the 64 sums of ``(x-μ)·v · (x-μ)_d`` — i.e.
    the matrix-vector product X^T(Xv) WITHOUT materializing the
    covariance matrix (64×64 sums) or shuffling anything data-sized.
    The centered row projects to a real column first so codegen reuses
    it across the 64 extraction terms (HOF lambdas are not CSE'd).
    Per-round 1e-6 quantization of the normalized vector keeps the
    trajectory engine-exact for the unrolled SQL oracle; v0 = e_1.

    Every data-sized aggregation — the mean vector, each round's 64
    X^T(Xv) sums, and the total-variance sum — is an exact integer
    sufficient statistic (r8 verdict item 3, closing the r6
    accepted-ULP note): per-row terms quantize to nano-units, the
    DECIMAL(38,0) sums are exact, and the floats are reconstructed
    once on the driver — no statistic depends on partitioning or
    summation order. The only remaining float reductions are the
    64-element driver-side norm and eigenvalue arithmetic, which are
    deterministic (fixed d-order Python loops) and mirrored verbatim
    in the oracle.
    """
    arr = as_double(vec_col)
    mean_aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.sum(_qnano(F.element_at(arr, d + 1))).alias(f"m{d}") for d in range(dims)
    ]
    mrow = emb.agg(*mean_aggs).collect()[0]  # c: 1row
    if not mrow["_n"]:
        # degenerate-input guard (r8 empty-corpus sweep): sum over zero
        # rows is NULL — fail loudly instead of float(None) downstream
        raise ValueError("pca_power_top1: empty embedding frame")
    mu = [
        _round_half_up(float(mrow[f"m{d}"]) / mrow["_n"] / 1e9, 6)
        for d in range(dims)
    ]
    mu_lit = F.array(*[F.lit(float(x)) for x in mu])
    base = emb.select(
        F.zip_with(arr, mu_lit, lambda a, b: a - b).alias("cx")
    ).localCheckpoint(eager=True)

    v = [1.0] + [0.0] * (dims - 1)
    eig = 0.0
    n_rows = None
    total_var = None
    cxd = lambda d: F.element_at(F.col("cx"), d + 1)  # noqa: E731
    for t in range(iterations):
        v_lit = F.array(*[F.lit(float(x)) for x in v])
        dot = F.aggregate(
            F.zip_with(F.col("cx"), v_lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        aggs = [F.count(F.lit(1)).alias("_n")] + [
            F.sum(_qnano(dot * cxd(d))).alias(f"w{d}") for d in range(dims)
        ]
        if t == 0:
            # total variance rides round 1's scan (one job saved): ONE
            # exact integer sum over every (row, dim) cx^2 term — a
            # single python int, so no cross-dim float ordering either
            aggs += [F.sum(_qnano(cxd(d) * cxd(d))).alias(f"v{d}") for d in range(dims)]
        row = base.agg(*aggs).collect()[0]  # c: 1row
        n_rows = row["_n"]
        if t == 0:
            total_var_int = sum(int(row[f"v{d}"]) for d in range(dims))
        w = [float(row[f"w{d}"]) / 1e9 for d in range(dims)]
        norm = sum(x * x for x in w) ** 0.5
        eig = norm / n_rows
        v = [_round_half_up(x / norm, 6) for x in w]
    total_var = float(total_var_int) / 1e9 / n_rows
    return v, eig, eig / total_var
