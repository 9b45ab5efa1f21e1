"""Scalar function library: parse (str -> typed), dump (typed -> str), lists.

Native Column expressions wherever Catalyst can express the semantics
(SURVEY §2.5); the single grammar-dependent scalar (``format_list``) rides
the documented pandas_udf fallback path.
"""

from .dumping import dump_datetime, dump_gps, dump_int, dump_percentage, dump_str
from .lists import format_list, format_list_py, to_list
from .parsing import (
    SparkParser,
    create_str2strnullable,
    format_montant,
    parse_shitty_date,
    parse_shitty_date_as_date,
    parse_shitty_datetime,
    parse_shitty_time,
    py_strip,
    str2bool,
    str2boolnullable,
    str2floatamount,
    str2floatnullable,
    str2intamount,
    str2intnullable,
    str2strnullable,
)

__all__ = [
    "SparkParser",
    "create_str2strnullable",
    "format_montant",
    "parse_shitty_date",
    "parse_shitty_date_as_date",
    "parse_shitty_datetime",
    "parse_shitty_time",
    "py_strip",
    "str2bool",
    "str2boolnullable",
    "str2floatamount",
    "str2floatnullable",
    "str2intamount",
    "str2intnullable",
    "str2strnullable",
    "dump_datetime",
    "dump_gps",
    "dump_int",
    "dump_percentage",
    "dump_str",
    "format_list",
    "format_list_py",
    "to_list",
]
