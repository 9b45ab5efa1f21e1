from .base import ImportMode, Source
from .csv import CsvSource
from .generator import GeneratorSource
from .jsonl import JsonlSource
from .xml import XmlSource
from .fixedwidth import FixedWidthSource
from .table import JdbcSource, Relation, TableSource

__all__ = [
    "ImportMode",
    "Source",
    "CsvSource",
    "TableSource",
    "JdbcSource",
    "Relation",
    "GeneratorSource",
    "JsonlSource",
    "XmlSource",
    "FixedWidthSource",
]
