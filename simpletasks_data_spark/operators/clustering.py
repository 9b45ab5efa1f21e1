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
  exactly (paired-BIGINT split sums below :data:`_QSUM_SAFE_ROWS`
  rows, one DECIMAL(38,0) sum above it — the count-gated overflow
  fallback; recombined on the driver / HUGEINT in DuckDB — same
  integer either way), and divide once on
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


_LO_BITS = 31
_LO_MASK = (1 << _LO_BITS) - 1

# Count gate for the paired-BIGINT split (VERDICT r10 item 1): the lo
# partial sums values in [0, 2^31), so a SIGNED 64-bit sum is safe up to
# 2^32 addends; the hi partial is |q|/2^31-bounded and far safer at our
# nano-unit magnitudes. Above this row count PER GROUP the caller must
# take the wide (DECIMAL(38,0)) path — Spark's non-ANSI long sum wraps
# SILENTLY, and for pca a "group" is the whole corpus, so a 100 TB run
# (tens of billions of rows) would otherwise corrupt the exact statistic
# the determinism contract rests on. 2^31 keeps 2x headroom below the
# true 2^32 bound. Tests shrink this to force the gate
# (tests/test_round3_ops.py::test_qsum_wide_gate_*).
_QSUM_SAFE_ROWS = 1 << 31


def _qnano(c: Column) -> Column:
    """Per-row nano-unit quantization: ``floor(x*1e9 + 0.5)`` is the
    identical IEEE double op in every engine and yields a BIGINT here
    (mirrors the oracle's ``floor(x*1e9 + 0.5)`` HUGEINT-summed term;
    same pattern as queries._logreg_gd_multi)."""
    return F.floor(c * F.lit(1000000000.0) + F.lit(0.5))


def _qsum(q: Column, name: str, wide: bool = False) -> list[Column]:
    """Exact integer sum of a nano-quantized BIGINT as a PAIR of BIGINT
    sums (round-10 perf recovery, VERDICT r9 item 1b): the long splits
    into ``hi = q >> 31`` (arithmetic shift = floor division, correct
    for negatives) and ``lo = q & (2^31-1)`` so that
    ``q == hi*2^31 + lo`` exactly; both partial sums stay comfortably
    inside BIGINT (|hi| <= |q|/2^31, 0 <= lo < 2^31, so the lo sum is
    the binding bound: safe to 2^32 addends) and the driver reconstructs
    the SAME exact integer the old DECIMAL(38,0) sum produced — pure
    long codegen instead of per-row decimal conversion, identical
    statistic, so the DuckDB HUGEINT oracles are untouched.

    ``wide=True`` is the count-gated fallback (VERDICT r10 item 1):
    ONE DECIMAL(38,0) sum, exact to ~10^38 — callers switch to it when a
    group's row count can reach :data:`_QSUM_SAFE_ROWS`, because past
    that the paired-long partials wrap silently (non-ANSI long sum).
    Both paths yield the identical integer via :func:`_qget`."""
    if wide:
        return [F.sum(q.cast("decimal(38,0)")).alias(f"{name}_w")]
    return [
        F.sum(F.shiftright(q, _LO_BITS)).alias(f"{name}_hi"),
        F.sum(q.bitwiseAND(F.lit(_LO_MASK))).alias(f"{name}_lo"),
    ]


def _qget(row, name: str) -> int:
    """Recombine a :func:`_qsum` result (either form) into the exact
    Python integer sum."""
    if f"{name}_w" in row.__fields__:
        return int(row[f"{name}_w"])
    return int(row[f"{name}_hi"]) * (1 << _LO_BITS) + int(row[f"{name}_lo"])


def _count_and_validate(df: DataFrame, vec: Column, dims: int, op: str) -> int:
    """ONE scan returning the exact row count after failing loudly on
    NULL or wrong-length vectors (ADVICE r10: ``posexplode`` silently
    DROPS a NULL array, so without this guard the integer statistics
    would quietly compute over the non-null subset with a smaller n —
    the opposite of the documented fail-loud contract). The count also
    feeds the :data:`_QSUM_SAFE_ROWS` wide-sum gate, so the scan does
    double duty."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(vec.isNull() | (F.size(vec) != dims), 1).otherwise(0)
        ).alias("bad"),
    ).first()  # c: 1row
    if row["n"] == 0:
        raise ValueError(f"{op}: empty embedding frame")
    if row["bad"]:
        raise ValueError(
            f"{op}: {row['bad']} rows with NULL or wrong-length "
            f"(!= {dims}) vectors — refusing to silently drop them"
        )
    return int(row["n"])


def _dlit(x: float) -> str:
    """Exact SQL double literal: repr() is the shortest round-tripping
    decimal, and CAST('..' AS DOUBLE) parses it correctly-rounded — the
    identical double the Python float holds (constant-folded once)."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


# Row-count threshold where the UNROLLED codegen assign overtakes the
# compact HOF assign: the unrolled k x dims expression tree costs
# ~1.5-2s/round of driver-side analysis (constant w.r.t. data) but runs
# ~10x faster per row (codegen vs interpreted HOF — measured in
# scripts/scale_probe_ml.py at 2M rows); the HOF tree is ~free to plan
# but interpreted. Both produce bit-identical values (same left-assoc
# order; squares are +0.0, so the fold's 0.0 seed is exact) — pinned by
# tests/test_round3_ops.py::test_assign_strategies_identical.
UNROLL_MIN_ROWS = 100_000


def _d2_hof(vec: Column, cen: list[float]) -> Column:
    """Squared L2 distance as zip_with + aggregate: a ~10-node tree the
    optimizer plans instantly; evaluation is interpreted per row."""
    lit = F.array(*[F.lit(float(c)) for c in cen])
    sq = F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)


def _assign(
    base: DataFrame, cents: list[list[float]], unroll: bool = False
) -> DataFrame:
    """(id, vec) -> (id, vec, cluster_id, d2_r): nearest centroid by
    1e-4-rounded squared L2, ties to the smaller centroid id. ``unroll``
    picks the codegen distance strategy for data-sized inputs (see
    UNROLL_MIN_ROWS); values are bit-identical either way.

    The unroll branch emits the WHOLE k-centroid argmin as ONE SQL
    string (r10 verdict item 6, measured in SCALING.md round-11): one
    parse owns the k x dims tree instead of k F.expr calls composed
    through py4j Column ops — plan construction drops ~3x (0.68 ->
    0.23 s at k=8, dims=64), a per-round driver saving that is constant
    in data size. The analyzed tree is identical term-for-term, so
    values (and the unrolled-CTE oracles) are untouched — pinned by
    test_assign_strategies_identical."""
    if unroll:
        structs = ", ".join(
            "struct(round("
            + " + ".join(
                f"(element_at(vec, {d + 1}) - {_dlit(c)}) * "
                f"(element_at(vec, {d + 1}) - {_dlit(c)})"
                for d, c in enumerate(cen)
            )
            + f", 4) AS d2_r, CAST({cid} AS BIGINT) AS cid)"
            for cid, cen in enumerate(cents)
        )
        return (
            base.selectExpr("*", f"array_min(array({structs})) AS _best")
            .withColumn("cluster_id", F.col("_best.cid"))
            .withColumn("d2_r", F.col("_best.d2_r"))
            .drop("_best")
        )
    cand = F.array(
        *[
            F.struct(
                F.round(_d2_hof(F.col("vec"), cen), 4).alias("d2_r"),
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
    component quantizes per-row to nano-units, the paired-BIGINT sums
    (:func:`_qsum`) recombine to the exact integer, and the mean is one
    driver-side division before the 1e-6 rounding — the trajectory
    cannot depend on partitioning or summation order (the
    logreg/pagerank pattern).
    """
    # LAZY checkpoint: the fail-loud NULL/ragged guard below is the
    # materializing action (the ranking-kernel pattern, r11 §15), so the
    # gate count costs ZERO extra jobs — round 11's eager checkpoint +
    # separate count() paid one full scan job per call and drove the
    # driver-measured kmeans_embeddings 0.50x regression (VERDICT r11
    # item 3). The count drives BOTH the assign strategy and the
    # wide-sum overflow gate. Per-(cluster,d) group counts are bounded
    # by n_base, so gating on the total is conservative-correct.
    base = emb.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("vec")
    ).localCheckpoint(eager=False)
    n_base = _count_and_validate(base, F.col("vec"), dims, "kmeans_lloyd")
    wide = n_base >= _QSUM_SAFE_ROWS
    init_rows = base.orderBy("id").limit(k).select("vec").collect()  # c: topk
    cents = [[_round_half_up(x, 6) for x in r["vec"]] for r in init_rows]
    # size-adaptive assign strategy (values identical either way)
    unroll = n_base >= UNROLL_MIN_ROWS
    assigned = None
    for _ in range(iterations):
        assigned = _assign(base, cents, unroll=unroll)
        # Update step: posexplode + groupBy(cluster_id, d) — a ~10-
        # expression plan regardless of dims (a dims-wide agg costs
        # 1-2s/round of driver-side construction + analysis, the r9
        # regression mechanism). cluster_id is an attribute of the
        # Generate's CHILD here, so the argmin is computed once per row
        # and carried through the explode (requiredChildOutput) — see
        # the hoist trap note in pca_power_top1. Map-side partial agg
        # collapses each partition to <= k*dims tiny rows.
        exploded = assigned.select(
            "cluster_id", F.posexplode("vec").alias("d", "x")
        )
        agg = exploded.groupBy("cluster_id", "d").agg(
            F.count(F.lit(1)).alias("n"), *_qsum(_qnano(F.col("x")), "s", wide=wide)
        )
        sums: dict[int, dict[int, float]] = {}
        for r in agg.collect():  # c: topk
            # float() of the exact integer FIRST (one correctly-rounded
            # conversion, same as the old float(Decimal) and the oracle's
            # HUGEINT::DOUBLE cast), then the float divisions
            sums.setdefault(r["cluster_id"], {})[r["d"]] = _round_half_up(
                float(_qget(r, "s")) / r["n"] / 1e9, 6
            )
        cents = [
            [sums[cid][d] for d in range(dims)] if cid in sums else cen
            for cid, cen in enumerate(cents)
        ]
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
    Both the centered row AND the per-round dot product project to real
    columns below the aggregate so codegen evaluates each once per row
    across the 64 extraction terms (HOF lambdas are not CSE'd; the
    round-9 regression came from inlining the dot into all 64 sums).
    Per-round 1e-6 quantization of the normalized vector keeps the
    trajectory engine-exact for the unrolled SQL oracle; v0 = e_1.

    Every data-sized aggregation — the mean vector, each round's 64
    X^T(Xv) sums, and the total-variance sum — is an exact integer
    sufficient statistic (r8 verdict item 3, closing the r6
    accepted-ULP note): per-row terms quantize to nano-units, the
    paired-BIGINT sums (:func:`_qsum`) recombine to the exact integer,
    and the floats are reconstructed once on the driver — no statistic
    depends on partitioning or summation order. The remaining float
    reductions are driver-side and deterministic here (fixed d-order
    Python loops); note the one residual cross-engine order-sensitive
    float sum is the oracle's 64-term ``sum(w*w)`` norm, which DuckDB
    aggregates in hash GROUP BY emission order, not this loop's d-order
    — at 64 well-scaled terms no divergence has ever been observed, but
    it is order-sensitive in principle (unlike the integer statistics,
    which are order-free by construction).
    """
    arr = as_double(vec_col)
    src = emb.select(arr.alias("v"))
    # fail-loud NULL/ragged guard + exact count in one column-pruned
    # scan; also empty-frame guard (r8) and the wide-sum overflow gate —
    # pca's "group" is the whole corpus per dimension, so at 100 TB the
    # paired-long partials would wrap silently without this.
    n_src = _count_and_validate(src, F.col("v"), dims, "pca_power_top1")
    wide = n_src >= _QSUM_SAFE_ROWS
    # mean vector via posexplode + groupBy(d): same tiny-plan rationale
    # as the kmeans_lloyd update step (round-10 perf recovery)
    mrows = (
        src.select(F.posexplode("v").alias("d", "x"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("_n"), *_qsum(_qnano(F.col("x")), "m", wide=wide))
        .collect()  # c: topk
    )
    by_d = {r["d"]: r for r in mrows}
    mu = [
        _round_half_up(float(_qget(by_d[d], "m")) / by_d[d]["_n"] / 1e9, 6)
        for d in range(dims)
    ]
    mu_lit = F.array(*[F.lit(float(x)) for x in mu])
    # LAZY checkpoint: round 1's collect materializes it (r11 §15
    # ranking-kernel pattern) — the eager form paid a dedicated
    # materialization job per call; rounds 2..n still read the
    # checkpointed bytes, never the source scan.
    base = src.select(
        F.zip_with(F.col("v"), mu_lit, lambda a, b: a - b).alias("cx")
    ).localCheckpoint(eager=False)

    v = [1.0] + [0.0] * (dims - 1)
    eig = 0.0
    n_rows = None
    total_var = None
    for t in range(iterations):
        # Round plan (round-10 final shape, measured across three
        # alternatives — see SCALING.md "Round-10 batch"):
        #
        #   Project(cx, dot) -> Generate posexplode(cx) -> groupBy(d)
        #
        # * the dot product is one UNROLLED left-associative chain in
        #   its OWN select BELOW the explode: plain expressions run
        #   inside codegen where a zip_with/aggregate HOF is interpreted
        #   per row, and a projection that lives in the Generate's
        #   child is computed once per row and carried through the
        #   explode (requiredChildOutput). HOIST TRAP (measured ~5x
        #   slower per round at 2M rows): aliasing dot in the SAME
        #   select as posexplode places the Project ABOVE Generate and
        #   re-evaluates it per exploded row — O(dims^2);
        # * left-assoc `+` matches the HOF fold order term-for-term so
        #   the trajectory and the unrolled SQL oracle are bit-identical
        #   (the fold's 0.0 seed only shifts the sign of an all-zero
        #   dot, which floor(q+0.5) erases);
        # * posexplode + groupBy(d) keeps the plan ~10 expressions
        #   regardless of dims (a dims-wide agg costs 1-2s/round of
        #   driver construction + analysis — the r9 regression); the
        #   partial agg collapses each partition to dims tiny rows, so
        #   shuffle volume is independent of row count (measured flat
        #   0.8 MB/round from sf0.1 to x1000).
        dot_sql = " + ".join(
            f"element_at(cx, {d + 1}) * {_dlit(v[d])}" for d in range(dims)
        )
        stage = base.selectExpr("cx", f"({dot_sql}) AS dot")
        exploded = stage.select("dot", F.posexplode("cx").alias("d", "x"))
        aggs = [F.count(F.lit(1)).alias("_n")]
        aggs += _qsum(_qnano(F.col("dot") * F.col("x")), "w", wide=wide)
        if t == 0:
            # total variance rides round 1's scan (one job saved): ONE
            # exact integer sum over every (row, dim) cx^2 term — a
            # single python int, so no cross-dim float ordering either
            aggs += _qsum(_qnano(F.col("x") * F.col("x")), "tv", wide=wide)
        rows = exploded.groupBy("d").agg(*aggs).collect()  # c: topk
        by_d = {r["d"]: r for r in rows}
        n_rows = by_d[0]["_n"]
        if t == 0:
            total_var_int = sum(_qget(by_d[d], "tv") for d in range(dims))
        w = [float(_qget(by_d[d], "w")) / 1e9 for d in range(dims)]
        norm = sum(x * x for x in w) ** 0.5
        eig = norm / n_rows
        v = [_round_half_up(x / norm, 6) for x in w]
    total_var = float(total_var_int) / 1e9 / n_rows
    return v, eig, eig / total_var
