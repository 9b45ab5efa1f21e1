"""Slowly-changing-dimension (type 2) construction from a change log.

Not in the reference engine (upOwa/simpletasks-data keeps only a flat
history table of old/new values — importtask.py's history append); SCD2
versioning is the standard warehouse representation of the same
information, so it rounds out the extension surface next to the CDC
history sink (plans/history.py).

``scd2_from_changelog`` — given an event/CDC stream of (key, attrs, ts)
rows, emit one row per *state version*: consecutive rows whose tracked
attributes did not change are collapsed, each surviving row gets
``valid_from`` = its timestamp, ``valid_to`` = the next version's
timestamp (NULL while current), and ``is_current``.

Scale shape: ONE hash exchange on the key; every window (the change
detector's ``lag`` and the interval builder's ``lead``) shares the same
(key) partitioning and (ts, tiebreak) ordering, and Spark preserves both
partitioning and sort order through the intermediate filter, so the whole
operator is shuffle-once sort-once per 100 TB of log. No UDFs, no
driver materialization, state never held beyond a partition sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_changelog"]


def scd2_from_changelog(
    df: DataFrame,
    key: Sequence[str] | str,
    attrs: Sequence[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 version rows.

    Parameters
    ----------
    df : the change log; one row per observed state.
    key : entity key column(s).
    attrs : tracked attribute columns; a version boundary is any row where
        at least one differs (null-safely) from the previous row's value.
    ts_col : event-time column; version validity is [ts, next_ts).
    tiebreak : unique column ordering rows within equal timestamps
        (required for determinism when ts collides; e.g. an event id).
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)

    state = F.struct(*[F.col(a) for a in attrs])
    changed = ~state.eqNullSafe(F.lag(state).over(w)) | F.lag(state).over(w).isNull()
    # lag(struct) is NULL only on the first row per key (structs of NULLs
    # are not NULL), so `changed` is exactly: first row OR attrs differ.
    versions = df.withColumn("_chg", changed).where(F.col("_chg")).drop("_chg")

    # Same partitioning + ordering as `w`: the filter above preserves both,
    # so this window adds no exchange and no extra sort.
    return versions.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
