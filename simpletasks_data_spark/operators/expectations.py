"""Declarative data-quality expectations, evaluated in ONE pass.

The ingest side of a training pipeline gates every batch on constraint
checks (null explosions, key duplication, broken enums, dangling foreign
keys) before letting it near the corpus. The design constraint mirrors
``operators/profile.py``: a naive checker runs one job per expectation;
here every row-level predicate, the uniqueness checks, and the
referential checks are folded into a SINGLE aggregation over one scan
(referential dims are broadcast-joined in front of the agg), then
unpivoted with ``explode`` into one row per expectation.

Output: ``(check, violations, n_rows, passed)`` — ``passed`` is
``violations == 0``, so a batch gate is ``results.where(~passed).count()
== 0`` (or inspect per-check rows).

Row-level predicates are arbitrary Column expressions (True = OK), so
anything the engine can express is an expectation; ``not_null`` /
``in_range`` / ``one_of`` / ``matches`` below are just common builders.
Uniqueness is not a row predicate — it is computed as
``count(col) - count(distinct col)`` inside the same aggregation (excess
non-null duplicates; Catalyst plans the multi-distinct via Expand, the
same exact-vs-HLL tradeoff documented in profile.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "not_null", "in_range", "one_of", "matches"]


def not_null(col: str) -> Column:
    return F.col(col).isNotNull()


def in_range(col: str, lo=None, hi=None) -> Column:
    """NULL passes (pair with not_null to also reject NULLs)."""
    c = F.col(col)
    ok = F.lit(True)
    if lo is not None:
        ok = ok & (c >= F.lit(lo))
    if hi is not None:
        ok = ok & (c <= F.lit(hi))
    return c.isNull() | ok


def one_of(col: str, values: Sequence) -> Column:
    c = F.col(col)
    return c.isNull() | c.isin(list(values))


def matches(col: str, regex: str) -> Column:
    c = F.col(col)
    return c.isNull() | c.rlike(regex)


def expect(
    df: DataFrame,
    row_checks: Optional[Dict[str, Column]] = None,
    unique: Sequence[str] = (),
    references: Optional[Dict[str, tuple]] = None,
) -> DataFrame:
    """Evaluate expectations over ``df`` in one aggregation job.

    - ``row_checks``: {check_name: boolean Column, True = row passes}
    - ``unique``: columns whose non-null values must be distinct
    - ``references``: {check_name: (fk_col, dim_df, dim_key)} — every
      non-null fk value must exist in the dim's key column. The dim key
      set is deduplicated and broadcast (dims are small relative to the
      fact; for a dim too large to broadcast, pre-join a semi-join marker
      instead and pass it as a row check).
    """
    row_checks = dict(row_checks or {})
    references = dict(references or {})

    work = df
    ref_flags: Dict[str, Column] = {}
    for name, (fk, dim, dim_key) in references.items():
        marker = f"_ref_{name}"
        keys = dim.select(F.col(dim_key).alias(fk)).distinct().withColumn(
            marker, F.lit(True)
        )
        work = work.join(F.broadcast(keys), on=fk, how="left")  # b: dim
        ref_flags[name] = F.col(fk).isNull() | F.coalesce(F.col(marker), F.lit(False))

    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    names = []
    for name, pred in list(row_checks.items()) + list(ref_flags.items()):
        names.append(name)
        aggs.append(F.count_if(~F.coalesce(pred, F.lit(False))).alias(f"_v_{name}"))
    for col in unique:
        name = f"unique_{col}"
        names.append(name)
        aggs.append(
            (F.count(col) - F.countDistinct(col)).cast("long").alias(f"_v_{name}")
        )

    one = work.agg(*aggs)
    rows = [
        F.struct(
            F.lit(name).alias("check"),
            F.col(f"_v_{name}").alias("violations"),
            F.col("_n").alias("n_rows"),
            (F.col(f"_v_{name}") == 0).alias("passed"),
        )
        for name in names
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
