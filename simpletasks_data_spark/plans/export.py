"""Export: the reverse direction of the mapping — typed table -> formatted
strings -> CSV/sheet rows.

The reference attaches a ``formatter: value -> str`` per column
(``/root/reference/simpletasks_data/mapping.py:42, 54, 66-69``) with
defaults ``str(x)`` / ``""``; the dump library (``formatting.py:14-93``)
supplies date/int/percentage/string formatters. Here an export spec is a
list of (output_name, Column-expression) pairs built from the native dump
functions, so the whole export stays in codegen and writes distributed.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["default_formatter", "export_frame", "write_csv", "write_corpus"]


def default_formatter(col: Column) -> Column:
    """Reference default: ``str(x)`` for non-null, empty string for NULL."""
    return F.coalesce(col.cast("string"), F.lit(""))


def export_frame(
    df: DataFrame, spec: Sequence[Tuple[str, Optional[Callable[[Column], Column]]]]
) -> DataFrame:
    """Apply per-column formatters: spec entries are (column_name,
    formatter) where None means the default str(x)/"" formatter."""
    out = []
    for name, fmt in spec:
        c = F.col(name)
        out.append((fmt(c) if fmt is not None else default_formatter(c)).alias(name))
    return df.select(*out)


def write_csv(df: DataFrame, path: str, header: bool = True, coalesce: Optional[int] = None) -> None:
    w = df.coalesce(coalesce) if coalesce else df
    w.write.mode("overwrite").option("header", header).csv(path)


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    max_records_per_file: Optional[int] = None,
    sort_within_partitions: Sequence[str] = (),
) -> None:
    """Training-corpus parquet writer: hive-partitioned layout (readers
    partition-prune on the partition columns), bounded output file sizes
    via ``maxRecordsPerFile`` (a 100 TB write must not emit
    one-giant-file-per-task), and optional within-partition sort so
    downstream scans get clustered row groups (min/max pruning on the
    sort key). The repartition on the partition columns keeps each hive
    partition written by as few tasks as possible — without it every
    task writes a sliver of every partition (the small-files problem at
    fleet scale)."""
    w = df
    if partition_by:
        w = w.repartition(*[F.col(c) for c in partition_by])
        if sort_within_partitions:
            w = w.sortWithinPartitions(*[F.col(c) for c in sort_within_partitions])
        writer = w.write.partitionBy(*partition_by)
    else:
        if sort_within_partitions:
            w = w.sortWithinPartitions(*[F.col(c) for c in sort_within_partitions])
        writer = w.write
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.mode("overwrite").parquet(path)
