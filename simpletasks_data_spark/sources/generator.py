"""In-memory / generator source (reference custom-generator sources,
``importsource.py:27-31`` and the README's in-memory example).

Rows are a Python iterable of string sequences (CSV semantics) or Rows;
``_src_pos`` is stamped driver-side from enumeration order, so the
reference's exact sequential semantics hold."""

from __future__ import annotations

from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..mapping import Mapping
from .base import SRC_POS, ImportMode, Source


class GeneratorSource(Source):
    def __init__(
        self,
        rows: Iterable[Sequence[str]],
        mapping: Mapping,
        mode: ImportMode = ImportMode.CREATE_AND_UPDATE,
        name: Optional[str] = None,
        num_columns: Optional[int] = None,
    ) -> None:
        super().__init__(mapping, mode=mode, name=name)
        self.rows = rows
        self.num_columns = num_columns

    def load_raw(self, spark: SparkSession) -> DataFrame:
        materialized = list(self.rows)
        n = self.num_columns
        if n is None:
            # Floor the width at the mapping's highest positional column so
            # an EMPTY source still builds a plannable frame (the reference
            # reads an empty file as zero rows and never indexes a column;
            # here the schema exists before any row does).
            from ..mapping import Column as _PosColumn

            mapped = [
                spec.column_number
                for _, spec in self.mapping.get_columns()
                if isinstance(spec, _PosColumn)
            ]
            n = max(
                max((len(r) for r in materialized), default=1),
                max(mapped, default=0) + 1,
            )
        fields = [T.StructField(f"_c{i}", T.StringType(), True) for i in range(n)]
        fields.append(T.StructField(SRC_POS, T.LongType(), False))
        schema = T.StructType(fields)
        data = []
        for i, row in enumerate(materialized):
            padded = list(row)[:n] + [None] * max(0, n - len(row))
            data.append(tuple(padded) + (i,))
        return spark.createDataFrame(data, schema)
