"""Independent Python references, batch 21: ACID query-level
expectations recomputed in pandas from the source parquet — the
time-travel rollup's three snapshots and the stats-pruned read —
complementing the from-first-principles log replay (batch 15)."""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark import queries as Q  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_acid_snapshot_rollup_matches_python(spark):
    got = {
        r["version"]: (r["op"], r["n_rows"], r["key_sum"])
        for r in Q.queries()["acid_snapshot_rollup"](spark, SF).collect()
    }
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderstatus"])
    snaps = {
        0: ("append", o[o.o_orderstatus == "F"]),
        1: ("append", o[o.o_orderstatus.isin(["F", "O"])]),
        2: ("overwrite", o[o.o_orderkey % 7 == 0]),
    }
    want = {
        v: (op, len(df), int(df.o_orderkey.sum())) for v, (op, df) in snaps.items()
    }
    assert got == want


def test_acid_pruned_read_matches_python(spark):
    rows = Q.queries()["acid_pruned_read"](spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    o = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    sel = o[(o.o_orderkey >= 500) & (o.o_orderkey <= 900)]
    assert r["n_rows"] == len(sel)
    assert r["key_sum"] == int(sel.o_orderkey.sum())
    # the pruned plan must actually have skipped files
    assert r["files_skipped"] == 1
