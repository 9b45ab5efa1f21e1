"""A/B timing harness for the clustering/PCA family (round-10 item 1).

Runs the four regression-gated queries plus the environment-control
query at sf0.1, min-of-2, and prints one JSON line per query plus a
summary. Usage: python scripts/ab_clustering.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.session import get_spark  # noqa: E402
from simpletasks_data_spark import queries as catalog  # noqa: E402

QUERIES = [
    "q1_pricing_summary",  # environment control (VERDICT r9 protocol)
    "pca_top_component",
    "kmeans_cluster_topics",
    "kmeans_embeddings",
    "knn_ivf_kmeans",
]


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab-clustering",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    catalog.load(spark, sf_dir, "region").count()
    q = catalog.queries()
    out = {}
    for name in QUERIES:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            q[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(json.dumps({"query": name, "sec": out[name]}), flush=True)
    print(json.dumps({"label": label, "timings": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
