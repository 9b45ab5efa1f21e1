"""Vector primitives over array<float|double> embedding columns.

Native Column expressions: the dot product / norms fold element-wise with
``zip_with`` + ``aggregate`` in a fixed left-to-right order, so results are
bit-reproducible (and comparable against an external engine composing the
same operations in the same order). Everything is cast to double first —
float32 inputs accumulate in float64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double", "dot", "norm2", "cosine", "bucket_signbits"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: Column | str) -> Column:
    return _c(col).cast("array<double>")


def dot(a: Column | str, b: Column | str) -> Column:
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm2(a: Column | str) -> Column:
    sq = F.transform(as_double(a), lambda x: x * x)
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def bucket_signbits(a: Column | str, bits: int = 8, offset: int = 0) -> Column:
    """Coarse IVF-style bucket id from the sign bits of ``bits`` dimensions
    starting at ``offset`` — a deterministic, engine-portable quantizer
    (2^bits cells). Distinct offsets give independent projections for
    multi-band candidate generation (LSH band trick)."""
    arr = as_double(a)
    expr = F.lit(0)
    for j in range(bits):
        expr = expr + F.when(F.element_at(arr, offset + j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return expr


def suggest_signbit_bits(n_rows: int, target_cell_rows: int = 1024) -> int:
    """Size the quantizer to the corpus: enough cells that an average cell
    holds ~``target_cell_rows`` vectors, so within-cell all-pairs work is
    O(n * target_cell_rows) instead of O(n^2 / 2^bits) with tiny bits.
    Clamped to [4, 20]."""
    import math

    if n_rows <= target_cell_rows:
        return 4
    return max(4, min(20, math.ceil(math.log2(n_rows / target_cell_rows))))
