"""Table/DataFrame source (reference ``ImportTable``, ``importsource.py:173-188``).

The reference materializes an SQLAlchemy ``query.all()``; here any
DataFrame works — an in-memory frame, a parquet read, or a JDBC relation
(predicates inside the passed DataFrame push down to the origin, the Spark
analogue of pre-filtering the query, SURVEY §2.1). Row order of a SQL
relation is undefined, so last-wins dedupe uses ``order_col`` when given,
else an arbitrary-but-deterministic order (all columns) so repeated runs
agree.

Relations: the reference's ``Field("rel.attr")`` walks ORM relationships
lazily with None short-circuit (``mapping.py:359-365``). Declare them as
:class:`Relation` entries — each related table is LEFT-joined once and
packed into a struct column named after the relation, so the dotted path
becomes ordinary struct traversal (Spark's ``a.b`` access already yields
NULL when the struct is NULL). One join per relation for the whole source
instead of the reference's per-row lazy loads; small dimension tables can
be broadcast."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Union

from pyspark.sql import DataFrame, DataFrameReader, SparkSession
from pyspark.sql import functions as F

from ..mapping import Mapping
from .base import SRC_POS, ImportMode, Source


@dataclass
class Relation:
    """A many-to-one relationship: ``local_key`` on the source rows points
    at ``foreign_key`` on ``df`` (a DataFrame or parquet path). With
    ``broadcast=True`` the related table is broadcast (use for small
    dimensions)."""

    df: Union[DataFrame, str]
    local_key: str
    foreign_key: str
    broadcast: bool = False


class TableSource(Source):
    def __init__(
        self,
        df: Union[DataFrame, str],
        mapping: Mapping,
        mode: ImportMode = ImportMode.CREATE_AND_UPDATE,
        name: Optional[str] = None,
        order_col: Optional[str] = None,
        relations: Optional[Dict[str, Relation]] = None,
    ) -> None:
        """``df``: a DataFrame, or a path string read as parquet.
        ``relations``: {relation_name: Relation} — mapped fields may then
        use ``Field("relation_name.column")``."""
        super().__init__(mapping, mode=mode, name=name)
        self._df = df
        self.order_col = order_col
        self.relations = relations or {}

    def get_header_line_number(self) -> int:
        # Typed relations have no header rows.
        return -1

    def _attach_relations(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        for rel_name, rel in self.relations.items():
            rdf = spark.read.parquet(rel.df) if isinstance(rel.df, str) else rel.df
            jk = f"_rk_{rel_name}"
            packed = rdf.select(
                F.col(rel.foreign_key).alias(jk),
                F.struct(*[F.col(c) for c in rdf.columns]).alias(rel_name),
            )
            if rel.broadcast:
                packed = F.broadcast(packed)  # b: optin
            df = df.join(packed, df[rel.local_key] == packed[jk], "left").drop(jk)
        return df

    def _load_frame(self, spark: SparkSession) -> DataFrame:
        """The bare relation; subclasses override ONLY this so ordering
        and relation attachment below apply uniformly."""
        return spark.read.parquet(self._df) if isinstance(self._df, str) else self._df

    def load_raw(self, spark: SparkSession) -> DataFrame:
        df = self._load_frame(spark)
        if self.order_col is not None:
            df = df.withColumn(SRC_POS, F.col(self.order_col).cast("long"))
        else:
            # Deterministic tiebreak: hash of the full row (base columns
            # only — attached relations must not change the order).
            # Collisions only make the choice between *identical-key*
            # duplicates arbitrary, which the reference leaves to query
            # order anyway.
            df = df.withColumn(SRC_POS, F.xxhash64(*[F.col(c) for c in df.columns]))
        return self._attach_relations(spark, df)


class JdbcSource(TableSource):
    """JDBC relation source; thin sugar over ``spark.read.format("jdbc")``.

    The merge-side contract (SRC_POS ordering, relation attachment) is
    inherited from :class:`TableSource`; this class only swaps the frame
    loader. The sandbox ships no JDBC driver jars, so tests pin the
    reader-option plumbing with a stubbed loader (tests/test_sources.py);
    against a real database the predicate/column pruning pushes into the
    remote query exactly as with any Spark JDBC relation."""

    def __init__(self, url: str, table: str, mapping: Mapping, properties: Optional[dict] = None, **kwargs) -> None:
        self.url = url
        self.table = table
        self.properties = properties or {}
        super().__init__(df=None, mapping=mapping, **kwargs)  # type: ignore[arg-type]

    def _load_frame(self, spark: SparkSession) -> DataFrame:
        reader: DataFrameReader = (
            spark.read.format("jdbc").option("url", self.url).option("dbtable", self.table)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()
