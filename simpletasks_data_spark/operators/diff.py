"""Snapshot diff (table-level CDC between two versions).

The ACID backend (plans/acid.py) gives every commit a version number and
time travel; ``snapshot_diff`` answers "what changed between version A
and version B" — the audit/debug/replication primitive a mutable target
table needs (the batch analogue of the reference's history stream,
SURVEY §2.2 history sink: history records per-column changes at merge
time, the diff reconstructs them between ANY two committed versions
after the fact).

Scale shape: ONE full-outer equi-join on the key (AQE picks the
strategy; both sides are plain parquet snapshot scans with column
pruning down to key + compared columns), and the per-row status is a
codegen'd null-safe comparison chain — no window, no second shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-status frame between two snapshots of the same table.

    Returns one row per key present in either snapshot: the key columns
    plus ``status`` in {'added', 'removed', 'changed', 'unchanged'}.
    ``compare_cols`` defaults to every shared non-key column; comparison
    is null-safe (NULL == NULL is unchanged, NULL vs value is changed).
    """
    cols = compare_cols or [c for c in old.columns if c in set(new.columns) and c not in set(keys)]
    # presence markers (compared columns may legitimately be NULL, so a
    # side's presence needs its own flag, not a NULL check on data cols)
    o = old.select(
        *keys, F.lit(1).alias("_o_present"), *[F.col(c).alias(f"_o_{c}") for c in cols]
    )
    n = new.select(
        *keys, F.lit(1).alias("_n_present"), *[F.col(c).alias(f"_n_{c}") for c in cols]
    )
    j = o.join(n, list(keys), "full_outer")
    differs = None
    for c in cols:
        d = ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        differs = d if differs is None else (differs | d)
    status = (
        F.when(F.col("_o_present").isNull(), F.lit("added"))
        .when(F.col("_n_present").isNull(), F.lit("removed"))
        .when(differs if differs is not None else F.lit(False), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*keys, status.alias("status"))
