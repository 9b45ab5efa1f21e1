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


def _single_group_fixture(tmp_path):
    """Schema-preserving copies where every stat query's grouping factor
    collapses to ONE level: orders all 1-URGENT, documents one lang,
    events one event_type — the single-group twin of the empty sweep."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "onegroup")
    os.makedirs(d, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        t = pq.read_table(f"{src}/{name}.parquet")
        if name == "orders":
            t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        elif name == "documents":
            t = t.filter(pc.equal(t["lang"], pc.unique(t["lang"])[0]))
        elif name == "events":
            t = t.filter(pc.equal(t["event_type"], "click"))
        pq.write_table(t, f"{d}/{name}.parquet")
    return d


def _single_day_fixture(tmp_path):
    """Orders with every o_orderdate forced to one day — the
    zero-variance twin for the time-series tests."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = str(tmp_path / "oneday")
    os.makedirs(d, exist_ok=True)
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        t = pq.read_table(f"{src}/{name}.parquet")
        if name == "orders":
            i = t.schema.get_field_index("o_orderdate")
            first = t["o_orderdate"][0].as_py()
            t = t.set_column(
                i,
                "o_orderdate",
                pa.array([first] * t.num_rows, t.schema.field(i).type),
            )
        pq.write_table(t, f"{d}/{name}.parquet")
    return d


def test_stat_reports_emit_zero_rows_on_single_group(spark, tmp_path):
    """The welch pattern, catalog-wide (r8 verdict item 6): a statistic
    whose null variance / degrees of freedom degenerate must emit ZERO
    rows — never a row of NULL statistics. Single-level factors kill
    ANOVA (k=1), Cochran-Armitage (one score level), Cramér's V
    (min(r-1,c-1)=0), chi-square (dof=0), the A/B z-test (one arm
    empty), and the BH-FDR z family (global rate exactly 1)."""
    d = _single_group_fixture(tmp_path)
    qs = Q.queries()
    for name in (
        "welch_ttest_urgent_price",
        "anova_price_by_priority",
        "cochran_armitage_priority_trend",
        "cramers_v_priority_segment",
        "chi2_lang_source_independence",
        "ab_test_conversion_ztest",
        "bh_fdr_urgent_nations",
    ):
        rows = qs[name](spark, d).collect()
        assert rows == [], f"{name} must emit zero rows on one group"


def test_trend_tests_emit_zero_rows_on_single_day(spark, tmp_path):
    """Zero-variance time series (one distinct day) make the Mann-
    Kendall and Ljung-Box statistics undefined — zero rows, not NULLs."""
    d = _single_day_fixture(tmp_path)
    qs = Q.queries()
    for name in ("mann_kendall_daily_revenue", "ljung_box_daily_revenue"):
        rows = qs[name](spark, d).collect()
        assert rows == [], f"{name} must emit zero rows on one day"


def test_stat_reports_never_emit_null_statistics(spark):
    """On REAL (healthy) data the same reports emit fully-populated
    rows — the degenerate guard must not eat legitimate output."""
    qs = Q.queries()
    for name in (
        "welch_ttest_urgent_price",
        "anova_price_by_priority",
        "cochran_armitage_priority_trend",
        "cramers_v_priority_segment",
        "chi2_lang_source_independence",
        "ab_test_conversion_ztest",
        "bh_fdr_urgent_nations",
        "mann_kendall_daily_revenue",
    ):
        rows = qs[name](spark, "/root/testdata/sf0.001").collect()
        assert rows, f"{name} must emit rows on healthy data"
        for r in rows:
            assert None not in r.asDict().values(), (name, r)
