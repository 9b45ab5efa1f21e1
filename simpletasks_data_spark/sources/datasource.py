"""Custom connectors via the Spark 4 Python DataSource API.

The reference's pitch is "import data from different sources (extensible)"
(``/root/reference/pyproject.toml:8``); its extension point is a Python
generator (``importsource.py:27-31``). Spark 4's `DataSource` API is the
idiomatic equivalent: a pure-Python connector that participates in real
query planning — partition listing on the driver, per-partition readers on
executors, Arrow-batched transfer.

``OrderedCsvDataSource`` is both the demo and a genuinely better exact-
order CSV path than the text-RDD route in ``csv.py``: each file is one
partition read with Python's ``csv.reader`` (correct multi-line quoted
records, unlike per-line ``from_csv``), and ``_src_pos`` encodes
``(file_index << 40) | line_index`` — a total order consistent with
file-then-line order without a driver-side counting pass.

Usage:
    spark.dataSource.register(OrderedCsvDataSource)
    df = (spark.read.format("ordered_csv")
          .option("path", "/data/in.csv").option("ncols", "6").load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SRC_POS = "_src_pos"


class _CsvFilePartition(InputPartition):
    def __init__(self, path: str, file_idx: int):
        self.path = path
        self.file_idx = file_idx


class OrderedCsvReader(DataSourceReader):
    def __init__(self, options, ncols: int):
        self.options = options
        self.ncols = ncols

    def _paths(self):
        import glob
        import os

        p = self.options["path"]
        if os.path.isdir(p):
            found = sorted(glob.glob(os.path.join(p, "*")))
        else:
            found = sorted(glob.glob(p)) or [p]
        return found

    def partitions(self):
        return [_CsvFilePartition(p, i) for i, p in enumerate(self._paths())]

    def read(self, partition: _CsvFilePartition):
        import csv

        delimiter = self.options.get("delimiter", ",")
        quotechar = self.options.get("quote", '"')
        encoding = self.options.get("encoding", "utf-8")
        base = partition.file_idx << 40
        with open(partition.path, "r", encoding=encoding, newline="") as f:
            reader = csv.reader(f, delimiter=delimiter, quotechar=quotechar)
            for line_idx, row in enumerate(reader):
                cells = list(row)[: self.ncols]
                cells += [None] * (self.ncols - len(cells))
                yield tuple(cells) + (base | line_idx,)


class OrderedCsvDataSource(DataSource):
    """format name: ``ordered_csv``; options: path (file/dir/glob), ncols,
    delimiter, quote, encoding."""

    @classmethod
    def name(cls) -> str:
        return "ordered_csv"

    def schema(self) -> str:
        ncols = int(self.options.get("ncols", "1"))
        cols = ", ".join(f"_c{i} string" for i in range(ncols))
        return f"{cols}, {SRC_POS} long"

    def reader(self, schema) -> OrderedCsvReader:
        return OrderedCsvReader(self.options, int(self.options.get("ncols", "1")))


def register_datasources(spark) -> None:
    """Idempotently register the engine's custom connectors."""
    try:
        spark.dataSource.register(OrderedCsvDataSource)
    except Exception:
        # Already registered (re-registration raises on some versions) or
        # DataSource API unavailable — the RDD-based path still works.
        pass
