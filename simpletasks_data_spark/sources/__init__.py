from .base import ImportMode, Source
from .csv import CsvSource
from .generator import GeneratorSource
from .table import TableSource

__all__ = ["ImportMode", "Source", "CsvSource", "TableSource", "GeneratorSource"]
