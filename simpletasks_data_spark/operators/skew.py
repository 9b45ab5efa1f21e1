"""Skew-mitigation helpers for hot keys at scale.

AQE's skew-join handling covers joins; aggregations over very-low-
cardinality keys (the classic ``GROUP BY status`` over 100 TB) still funnel
each key through one reducer. ``salted_aggregate`` runs the standard
two-phase trick explicitly: scatter each key over ``salt`` sub-keys
(partial aggregate), then combine. Only aggregates with a decomposition
(sum/count/min/max and anything built from them) qualify — the caller
supplies both phases.

``salted_join`` broadcasts-by-replication: the skewed fact side gets a
random-ish (deterministic hash-derived) salt; the dimension side is
replicated ``salt`` times so the equi-join key becomes (key, salt) —
spreading a hot key across ``salt`` reducers without changing results.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_aggregate", "salted_join"]

SALT = "_salt"


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial: Dict[str, Column],
    combine: Dict[str, Column],
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``partial`` aggregates per (keys, salt),
    ``combine`` merges partials per keys. ``partial`` maps output-col ->
    aggregate over input rows; ``combine`` maps final-col -> aggregate over
    the partial columns. Salt derives from a hash of ``salt_on`` (or
    a uniform spread of the whole row via spark_partition_id) so it is
    deterministic."""
    salt_col = (
        F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt))
        if salt_on
        else F.pmod(F.spark_partition_id(), F.lit(salt))
    )
    p = (
        df.withColumn(SALT, salt_col)
        .groupBy(*keys, SALT)
        .agg(*[c.alias(name) for name, c in partial.items()])
    )
    return p.groupBy(*keys).agg(*[c.alias(name) for name, c in combine.items()])


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``fact[key]`` is skewed: salt the fact side, explode
    the dim side across all salt values, join on (key, salt).

    The salt hashes the WHOLE fact row content, so it is stable under task
    retry and repartitioning (``monotonically_increasing_id`` is not — a
    retried stage would re-route rows). Identical rows share a salt, which
    is fine: correctness never depends on the salt, it only spreads a hot
    key across reducers."""
    f = fact.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    d = dim.withColumn(SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = f.join(d, [key, SALT], how)
    return out.drop(SALT)
