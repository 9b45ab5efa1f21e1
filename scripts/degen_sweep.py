"""Degenerate-input sweep: run EVERY catalog query against a tiny
(5-40 row) or fully-empty copy of the test tables and report exceptions.

    python scripts/degen_sweep.py tiny    # expectation: 0 failures
    python scripts/degen_sweep.py empty   # expectation: only the
                                          # documented loud-error family
                                          # (SCALING.md degenerate-input
                                          # policy)

The empty fixture MUST be written schema-preserving (pyarrow slice, not
pandas head(0) — an empty pandas round-trip degrades list/string column
types and produces bogus analyzer errors)."""
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.001"
ROWS = {"region": 99, "nation": 99, "customer": 20, "supplier": 5, "part": 20,
        "orders": 40, "lineitem": 60, "events": 30, "documents": 12, "embeddings": 12}


def build(tag: str) -> str:
    import pyarrow.parquet as pq

    d = f"/tmp/sds_degen_{tag}"
    os.makedirs(d, exist_ok=True)
    for name, n in ROWS.items():
        t = pq.read_table(f"{SRC}/{name}.parquet")
        pq.write_table(t.slice(0, 0 if tag == "empty" else n), f"{d}/{name}.parquet")
    return d


# The documented loud-error family for EMPTY inputs: every acceptable
# empty-corpus failure must be a ValueError matching one of these
# patterns (descriptive, operator-named — never a bare TypeError /
# AssertionError / ArrowInvalid).  Any failure outside this list is a
# regression and flips the exit code.
import re

EMPTY_ALLOWED = [
    r"^logreg GD: chain \d+ selects 0 rows",
    r"^kmeans_lloyd: empty embedding frame",
    r"^pca_power_top1: empty embedding frame",
    r"^knn_bruteforce_blas: empty candidate embedding frame",
    r"^merge_write_dry_run: dry-run produced zero created/updated rows",
    r"^streaming_late_data_drop: empty events table",
    r"^streaming_left_outer_attribution: events table has \d+ rows",
    r"^TxnTable\.read: table '.*' has no committed snapshots",
]


def _allowed_empty(exc: Exception) -> bool:
    if not isinstance(exc, ValueError):
        return False
    first = (str(exc).splitlines() or [""])[0]
    return any(re.search(p, first) for p in EMPTY_ALLOWED)


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    d = build(tag)
    import __spark_entry__ as e
    from simpletasks_data_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fails, unexpected = [], []
    qs = e.queries()
    for name, fn in qs.items():
        try:
            fn(spark, d).collect()
        except Exception as ex:
            msg = (str(ex).splitlines() or ["<no message>"])[0][:160]
            fails.append((name, type(ex).__name__, msg))
            ok = tag == "empty" and _allowed_empty(ex)
            if not ok:
                unexpected.append(name)
            print(
                f"{'fail-ok' if ok else 'FAIL':8s}{name}  "
                f"{type(ex).__name__}: {msg}",
                flush=True,
            )
    print(f"==== {tag}: {len(fails)} failures / {len(qs)} queries"
          + (f", {len(unexpected)} OUTSIDE the loud-error family: {unexpected}"
             if tag == "empty" else ""))
    if tag == "tiny":
        return 1 if fails else 0
    return 1 if unexpected else 0


if __name__ == "__main__":
    raise SystemExit(main())
