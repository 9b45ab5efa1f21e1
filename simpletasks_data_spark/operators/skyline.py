"""Multi-dimensional Pareto frontier (skyline) — distributed.

2-D skylines collapse to one sorted window (``pareto_frontier_suppliers``);
at 3+ dimensions no single-pass window exists, so this is the canonical
two-phase distributed skyline (block-nested-loop flavor):

1. **local frontiers**: every partition computes the skyline of its own
   rows (vectorized numpy dominance test via ``mapInPandas`` — O(p²·d)
   per partition on Arrow batches, p = partition rows);
2. **frontier of frontiers**: local survivors (a small set — skyline
   size grows ~O(log^(d-1) n) for independent dims) coalesce to one
   partition and the same kernel runs once more. A point dominated by
   ANY point is dominated by some skyline point, so phase 2 over phase-1
   survivors loses nothing.

Dominance is computed on the caller's already-ROUNDED metric columns, so
the surviving set is deterministic and engine-portable (the SQL oracle
is the naive NOT EXISTS self-join over the same rounded values).
Identical points do not dominate each other — duplicates co-survive.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

__all__ = ["skyline"]


def skyline(df: DataFrame, minimize: Sequence[str]) -> DataFrame:
    """Rows not dominated on the ``minimize`` columns (all <=, any <)."""
    import pandas as pd

    cols = list(minimize)

    def frontier(batches):
        import numpy as np

        # mapInPandas invokes with ZERO Arrow batches for an empty input
        # partition; pd.concat([]) raises, so guard before concatenating.
        batches = list(batches)
        if not batches:
            return
        pdf = pd.concat(batches, ignore_index=True)
        if not len(pdf):
            return
        vals = pdf[cols].to_numpy(dtype=np.float64)
        keep = np.ones(len(vals), dtype=bool)
        for i in range(len(vals)):
            v = vals[i]
            dominated = ((vals <= v).all(axis=1) & (vals < v).any(axis=1)).any()
            if dominated:
                keep[i] = False
        yield pdf[keep]

    local = df.mapInPandas(frontier, df.schema)
    return local.coalesce(1).mapInPandas(frontier, df.schema)
