"""Table/DataFrame source (reference ``ImportTable``, ``importsource.py:173-188``).

The reference materializes an SQLAlchemy ``query.all()``; here any
DataFrame works — an in-memory frame, a parquet read, or a JDBC relation
(predicates inside the passed DataFrame push down to the origin, the Spark
analogue of pre-filtering the query, SURVEY §2.1). Row order of a SQL
relation is undefined, so last-wins dedupe uses ``order_col`` when given,
else an arbitrary-but-deterministic order (all columns) so repeated runs
agree."""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql import functions as F

from ..mapping import Mapping
from .base import SRC_POS, ImportMode, Source


class TableSource(Source):
    def __init__(
        self,
        df: Union[DataFrame, str],
        mapping: Mapping,
        mode: ImportMode = ImportMode.CREATE_AND_UPDATE,
        name: Optional[str] = None,
        order_col: Optional[str] = None,
    ) -> None:
        """``df``: a DataFrame, or a path string read as parquet."""
        super().__init__(mapping, mode=mode, name=name)
        self._df = df
        self.order_col = order_col

    def get_header_line_number(self) -> int:
        # Typed relations have no header rows.
        return -1

    def load_raw(self, spark: SparkSession) -> DataFrame:
        df = spark.read.parquet(self._df) if isinstance(self._df, str) else self._df
        if self.order_col is not None:
            return df.withColumn(SRC_POS, F.col(self.order_col).cast("long"))
        # Deterministic tiebreak: hash of the full row. Collisions only make
        # the choice between *identical-key* duplicates arbitrary, which the
        # reference leaves to query order anyway.
        return df.withColumn(SRC_POS, F.xxhash64(*[F.col(c) for c in df.columns]))


class JdbcSource(TableSource):
    """JDBC relation source; thin sugar over ``spark.read.jdbc``."""

    def __init__(self, url: str, table: str, mapping: Mapping, properties: Optional[dict] = None, **kwargs) -> None:
        self.url = url
        self.table = table
        self.properties = properties or {}
        super().__init__(df=None, mapping=mapping, **kwargs)  # type: ignore[arg-type]

    def load_raw(self, spark: SparkSession) -> DataFrame:
        reader: DataFrameReader = spark.read.format("jdbc").option("url", self.url).option("dbtable", self.table)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        df = reader.load()
        if self.order_col is not None:
            return df.withColumn(SRC_POS, F.col(self.order_col).cast("long"))
        return df.withColumn(SRC_POS, F.xxhash64(*[F.col(c) for c in df.columns]))
