"""Time-series grid functions: arbitrary-width time bucketing.

``time_bucket`` truncates timestamps to a fixed-width epoch grid — the
TimescaleDB/`time_bucket` / DuckDB `time_bucket` semantics — which
``date_trunc`` can't express for widths like 15 minutes or 4 hours. Pure
Column arithmetic (unix seconds floor-divided by the width), so it stays
inside whole-stage codegen and is partition-prunable when the table is
partitioned on a bucket-derived column.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["time_bucket", "width_seconds"]


def width_seconds(width: str) -> int:
    """Parse a human interval ('15 minutes', '2 hours', '7 days') to whole
    seconds. Calendar-irregular units (month, year) are rejected by the
    underlying parser — a fixed grid has no calendar semantics."""
    s = pd.Timedelta(width).total_seconds()
    if s <= 0 or s != int(s):
        raise ValueError(f"bucket width must be a positive whole-second interval: {width!r}")
    return int(s)


def time_bucket(width: str, ts: Column) -> Column:
    """Truncate ``ts`` onto a ``width``-wide epoch-aligned grid.

    floor(epoch_seconds / w) * w — matches DuckDB's
    ``make_timestamp((epoch_us(ts) // w*1e6) * w*1e6)`` for positive
    epochs, and nests exactly: bucketing a bucket onto a coarser grid
    whose width is a multiple of the finer one is identity-stable.
    """
    w = width_seconds(width)
    return F.timestamp_seconds(F.floor(F.unix_timestamp(ts) / F.lit(w)) * F.lit(w))
