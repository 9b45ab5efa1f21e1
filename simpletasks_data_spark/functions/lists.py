"""formatList / to_list — quote- and paren-aware list splitting.

The reference parses ``'val1 (1,2,3), "val2 et val3"'`` into
``["val1 (1,2,3)", "val2, val3"]`` using a pyparsing grammar
(``/root/reference/simpletasks_data/formatting.py:96-131``): commas split
only at paren-depth 0 and outside quotes, after ``;`` and `` et ``/`` and ``
are rewritten to commas. That grammar is not expressible with Spark's
``split``; this is the one scalar on the documented UDF fallback path
(SURVEY §2.5). Exposed as an Arrow-vectorized pandas_udf so batches move
once per partition, not per row.

``to_list`` (drop falsy elements, formatting.py:431-440) stays native:
``F.filter`` over the array.
"""

from __future__ import annotations

from typing import List, Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = ["format_list_py", "format_list", "to_list"]


def format_list_py(
    string: Optional[str], replace_semicolons: bool = True, replace_ands: bool = True
) -> List[str]:
    """Pure-Python splitter with the reference's semantics; also used
    driver-side and in tests."""
    if string is None:
        return []

    value = string.strip()
    if replace_semicolons:
        value = value.replace(";", ", ")
    if replace_ands:
        value = value.replace(" et ", ", ").replace(" and ", ", ")

    raw_tokens: List[str] = []
    buf: List[str] = []
    depth = 0
    quote: Optional[str] = None
    for ch in value:
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            buf.append(ch)
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            raw_tokens.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    raw_tokens.append("".join(buf))

    tokens: List[str] = []
    for raw in raw_tokens:
        t = raw.strip()
        if len(t) >= 2 and t[0] in ("'", '"') and t[-1] == t[0]:
            t = t[1:-1]
        tokens.append(t)
    return [t for t in tokens if t]


@F.pandas_udf(ArrayType(StringType()))
def _format_list_udf(s: pd.Series) -> pd.Series:
    return s.map(format_list_py)


def format_list(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return _format_list_udf(c)


def to_list(col: Column | str) -> Column:
    """Drop falsy elements from an array<string> column (NULL / empty string
    — the string-typed subset of Python falsiness the reference filters)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(c, lambda x: x.isNotNull() & (x != ""))
