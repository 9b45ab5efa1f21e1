"""Scale probe for the iterative-ML family (r9 verdict item 6): measure
how pca_top_component / kmeans_embeddings / pagerank_customer_supplier /
ppr_seeded_customers walls grow when the input grows 10x (and, for the
tiny embeddings table, 100x and 1000x so the data-linear term actually
emerges from the per-round fixed cost).

Synthetic corpora are measurement fixtures only (never oracle inputs):

- embeddings xN: N copies of sf0.1's 2,000 vectors with offset vec_ids
  and a per-copy deterministic +1e-5-grade element perturbation (so IVF
  cells / cluster memberships aren't exact mirrors);
- graph x10: 10 copies of sf0.1 orders+lineitem with offset order /
  customer / supplier keys — 10 disjoint copies of the bipartite trade
  graph (organic: same degree distribution, 10x nodes and edges).

Each query runs through its production queries() entry pointed at the
synthetic directory. The probe session enables the Spark UI and sums
per-stage shuffle write bytes between stage markers via the REST API,
so every row reports (wall, wall/round, shuffle MB). Prints one JSON
line per (query, scale); paste the table into SCALING.md.

Usage: python scripts/scale_probe_ml.py [x10|x100|x1000|graph ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
ROUNDS = {
    "pca_top_component": 8,
    "kmeans_embeddings": 3,
    "pagerank_customer_supplier": 10,
    "ppr_seeded_customers": 10,
    # sorted-merge 1-D NN (propensity matching): not iterative; rides
    # the graph leg because it needs only the orders table
    "propensity_match_urgent": 1,
}


def _ui(spark) -> str:
    return spark.sparkContext.uiWebUrl


def _stages(spark) -> list[dict]:
    app = spark.sparkContext.applicationId
    url = f"{_ui(spark)}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _shuffle_mb_since(spark, seen_ids: set) -> tuple[float, set]:
    stages = _stages(spark)
    new = [s for s in stages if (s["stageId"], s["attemptId"]) not in seen_ids]
    seen = seen_ids | {(s["stageId"], s["attemptId"]) for s in stages}
    mb = sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6
    return round(mb, 1), seen


def build_emb(spark, mult: int) -> str:
    out = f"/tmp/sds_ml_emb_x{mult}"
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = emb.count()
    copies = spark.range(mult).select(F.col("id").alias("_c"))
    big = (
        emb.crossJoin(copies)  # constant-side copy fan-out, mult rows
        .select(
            (F.col("vec_id") + F.col("_c") * 10_000_000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                + ((F.col("_c") * 31 + i) % 97).cast("float") * F.lit(1e-5),
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
    )
    big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    open(marker, "w").close()
    print(json.dumps({"built": out, "rows": n * mult}), flush=True)
    return out


def build_graph(spark, mult: int = 10) -> str:
    out = f"/tmp/sds_ml_graph_x{mult}"
    marker = os.path.join(out, "_built")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    copies = spark.range(mult).select(F.col("id").alias("_c"))
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    o_big = o.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("_c") * 100_000_000).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("_c") * 10_000_000).alias("o_custkey"),
        *[c for c in o.columns if c not in ("o_orderkey", "o_custkey")],
    )
    li_big = li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("_c") * 100_000_000).alias("l_orderkey"),
        (F.col("l_suppkey") + F.col("_c") * 10_000_000).alias("l_suppkey"),
        *[c for c in li.columns if c not in ("l_orderkey", "l_suppkey")],
    )
    o_big.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "orders.parquet")
    )
    li_big.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out, "lineitem.parquet")
    )
    open(marker, "w").close()
    print(json.dumps({"built": out}), flush=True)
    return out


def run(spark, name: str, sf_dir: str, label: str, seen: set) -> set:
    import simpletasks_data_spark.queries as Q

    _, seen = _shuffle_mb_since(spark, seen)  # reset marker
    t0 = time.time()
    n = Q.queries()[name](spark, sf_dir).count()
    wall = time.time() - t0
    mb, seen = _shuffle_mb_since(spark, seen)
    # min-of-2: the first run pays one-off codegen compilation (the
    # bench protocol); shuffle volume is identical so run 1's is kept
    t0 = time.time()
    Q.queries()[name](spark, sf_dir).count()
    wall = min(wall, time.time() - t0)
    _, seen = _shuffle_mb_since(spark, seen)
    r = ROUNDS[name]
    print(
        json.dumps(
            {
                "query": name,
                "scale": label,
                "rows_out": n,
                "wall_sec": round(wall, 2),
                "per_round_sec": round(wall / r, 2),
                "shuffle_write_mb": mb,
            }
        ),
        flush=True,
    )
    return seen


def main() -> None:
    from simpletasks_data_spark.session import get_spark

    which = set(sys.argv[1:]) or {"x10", "x100", "x1000", "graph"}
    spark = get_spark(
        app_name="scale-probe-ml",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    seen: set = set()
    # baseline at sf0.1 (the real table)
    for q in ("pca_top_component", "kmeans_embeddings"):
        seen = run(spark, q, BASE, "sf0.1", seen)
    for mult, tag in ((10, "x10"), (100, "x100"), (1000, "x1000")):
        if tag not in which:
            continue
        d = build_emb(spark, mult)
        for q in ("pca_top_component", "kmeans_embeddings"):
            seen = run(spark, q, d, tag, seen)
    if "graph" in which:
        gq = (
            "pagerank_customer_supplier",
            "ppr_seeded_customers",
            "propensity_match_urgent",
        )
        for q in gq:
            seen = run(spark, q, BASE, "sf0.1", seen)
        d = build_graph(spark, 10)
        for q in gq:
            seen = run(spark, q, d, "x10", seen)
    spark.stop()


if __name__ == "__main__":
    main()
