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


def _spark_kind(dt):
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        # date vs timestamp both canonicalize fine at the driver
        # (r3-green DATE precedent); collapse to one temporal kind.
        return "temporal"
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "str"
    return dt.simpleString()


def _duck_kind(type_str):
    t = str(type_str).upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "HUGEINT":
        # DuckDB promotes sum(BIGINT) to HUGEINT; pandas fetches it as
        # float64 so the driver sees 78.0 vs Spark's 78 — r4's only red.
        # Give it its own kind so it can never silently equal "int".
        return "hugeint"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "temporal"
    if t == "VARCHAR":
        return "str"
    return t


def dtype_kind_mismatches(spark_schema, duck_cols, duck_types):
    """Per-column type-KIND comparison between a Spark result schema and a
    DuckDB relation's types. The external driver stringifies pandas cells,
    so an oracle column that pandas fetches as float64 against a Spark long
    column differs on EVERY row (``78.0`` vs ``78``) even when the values
    are numerically identical — exactly r4's ``hypertable_rollup_events``
    red, which the old ``%.6g`` canonicalization masked locally. Returns a
    list of "col: spark_kind vs duck_kind" strings (empty = clean)."""
    skinds = {f.name: _spark_kind(f.dataType) for f in spark_schema.fields}
    out = []
    for c, t in zip(duck_cols, duck_types):
        ok = _duck_kind(t)
        sk = skinds.get(c)
        if sk is not None and sk != ok:
            out.append(f"{c}: spark={sk} oracle={ok}")
    return out


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
    o_types = rel.types
    o_rows = rel.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(o_cols), f"{name}: columns {s_cols} vs {o_cols}"
    kind_bad = dtype_kind_mismatches(sdf.schema, o_cols, o_types)
    assert not kind_bad, (
        f"{name}: dtype-kind mismatch (driver stringifies pandas cells, so "
        f"int-vs-float diverges on every row): {kind_bad}"
    )
    sc, sn = _normalize(s_rows, s_cols)
    oc, on = _normalize(o_rows, o_cols)
    assert len(sn) == len(on), f"{name}: row count {len(sn)} vs {len(on)}"
    diffs = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not diffs, f"{name}: {len(diffs)} differing rows, first {diffs[:max_diff_show]}"
    return len(sn)
