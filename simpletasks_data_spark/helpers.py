"""A1-notation spreadsheet coordinate helpers.

Behavioral parity with the reference's ``helpers.py`` (``/root/reference/
simpletasks_data/helpers.py:6-100``), including partial cells ("A" -> column
only, "1" -> row only) and the ``*`` end-of-range wildcard. Pure driver-side
utilities used when a mapping addresses CSV/sheet columns by letter; no
Spark involvement — letters resolve to ordinals before the projection is
built.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

__all__ = ["col2num", "num2col", "cell2coords", "range2tab"]

_CELL_RE = re.compile(r"^([A-Z]*)(\d*)$")


def col2num(col: str) -> int:
    """Column letters -> 0-based index: "A" -> 0, "Z" -> 25, "AA" -> 26.
    Non-letter characters are skipped, as in the reference."""
    num = 0
    for ch in col:
        if ch.isascii() and ch.isalpha():
            num = num * 26 + (ord(ch.upper()) - ord("A")) + 1
    return num - 1


def num2col(n: int) -> str:
    """1-based column number -> letters: 1 -> "A", 26 -> "Z", 27 -> "AA"."""
    out = ""
    while n > 0:
        n, rem = divmod(n - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def cell2coords(cell: str) -> Tuple[Optional[int], Optional[int]]:
    """A1-notation cell -> (column, row), both 0-based, either possibly None
    for partial references: "A1" -> (0, 0), "A" -> (0, None), "1" -> (None, 0).

    Raises ValueError on anything else (e.g. "1A")."""
    m = _CELL_RE.match(cell)
    if not m:
        raise ValueError("Could not parse range {}".format(cell))
    column = col2num(m.group(1)) if m.group(1) else None
    row = int(m.group(2)) - 1 if m.group(2) else None
    return (column, row)


def range2tab(range: str) -> Tuple[int, int, Optional[int], Optional[int]]:
    """A1-notation range -> (start_col, start_row, end_col, end_row), 0-based.
    The end cell may be partial ("A1:B" -> open-ended rows) or the wildcard
    "*" (both ends None). The start cell must be complete."""
    extremes = range.split(":")
    if len(extremes) != 2:
        raise ValueError("Could not parse range {}".format(range))

    start_col, start_row = cell2coords(extremes[0])
    if start_col is None or start_row is None:
        raise ValueError("Could not parse range {}".format(range))

    if extremes[1] != "*":
        end_col, end_row = cell2coords(extremes[1])
    else:
        end_col, end_row = None, None

    return (start_col, start_row, end_col, end_row)
