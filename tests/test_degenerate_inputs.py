"""Fast pin of the degenerate-input policy (SCALING.md): the guarded
operators raise CLEAR errors on empty frames, and a representative slice
of the catalog runs clean on a tiny few-row dataset. The exhaustive
331-query sweep lives in scripts/degen_sweep.py (tiny: 0 failures;
empty: only the documented loud-error family)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from scripts.degen_sweep import build  # noqa: E402
from simpletasks_data_spark import queries as Q  # noqa: E402

REPRESENTATIVE = [
    # one per family: agg/join, window, merge-adjacent report, text,
    # dedup chain, embedding chain, streaming batch twin, stats, graph
    "q1_pricing_summary",
    "events_sessionize",
    "corpus_health_by_source",
    "text_quality",
    "dedup_clusters",
    "knn_bruteforce",
    "conversion_by_session_depth",
    "welch_ttest_urgent_price",
    "supplier_triangles",
    "parse_roundtrip",
]


def test_representative_queries_run_on_tiny_data(spark):
    d = build("tiny")
    qs = Q.queries()
    for name in REPRESENTATIVE:
        rows = qs[name](spark, d).collect()
        assert rows is not None, name


def test_empty_frames_raise_clear_errors(spark):
    from simpletasks_data_spark.operators.clustering import (
        kmeans_lloyd,
        pca_power_top1,
    )

    d = build("empty")
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    with pytest.raises(ValueError, match="empty embedding frame"):
        kmeans_lloyd(emb, k=8, iterations=1, dims=64)
    with pytest.raises(ValueError, match="empty embedding frame"):
        pca_power_top1(emb, iterations=1, dims=64)
    with pytest.raises(ValueError, match="selects 0 rows"):
        Q.queries()["logreg_urgent_orders"](spark, d).collect()


def test_empty_parquet_roundtrips_with_explicit_schema(spark):
    d = build("empty")
    assert Q.queries()["corpus_export_manifest"](spark, d).collect() == []
    assert Q.queries()["partitioned_parquet_prune"](spark, d).collect() == []
