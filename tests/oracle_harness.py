"""Local stand-in for the driver's correctness gate: run each catalog query
through Spark AND its oracle SQL through DuckDB on the same sf dir, then
compare row count, column names, and values (columns sorted by name, rows
sorted by all columns) — the same shape of check the driver performs."""

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def assert_driver_canonicalizable(name, sdf):
    """The external driver canonicalizes results with pandas
    (sort_values + value-hash); list/dict/struct cells raise
    ``TypeError: unhashable type`` there — exactly what killed
    kmeans_embeddings / pca_top_component / graph_random_walks in
    round 3 while the stringifying local harness waved them through.
    Mirror the driver: REJECT any non-scalar output column up front."""
    from pyspark.sql import types as T

    bad = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name}: non-scalar output columns {bad} — the driver's pandas "
        "canonicalizer cannot sort/hash these; emit exploded rows or a "
        "joined string instead"
    )


def compare(spark, name, fn, sql, sf_dir, max_diff_show=5):
    sdf = fn(spark, sf_dir)
    assert_driver_canonicalizable(name, sdf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_con(sf_dir)
    rel = con.sql(sql)
    o_cols = rel.columns
    o_rows = rel.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(o_cols), f"{name}: columns {s_cols} vs {o_cols}"
    sc, sn = _normalize(s_rows, s_cols)
    oc, on = _normalize(o_rows, o_cols)
    assert len(sn) == len(on), f"{name}: row count {len(sn)} vs {len(on)}"
    diffs = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not diffs, f"{name}: {len(diffs)} differing rows, first {diffs[:max_diff_show]}"
    return len(sn)
