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


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    d = build(tag)
    import __spark_entry__ as e
    from simpletasks_data_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fails = []
    qs = e.queries()
    for name, fn in qs.items():
        try:
            fn(spark, d).collect()
        except Exception as ex:
            msg = (str(ex).splitlines() or ["<no message>"])[0][:160]
            fails.append((name, type(ex).__name__, msg))
            print(f"FAIL  {name}  {type(ex).__name__}: {msg}", flush=True)
    print(f"==== {tag}: {len(fails)} failures / {len(qs)} queries")
    return 1 if (tag == "tiny" and fails) else 0


if __name__ == "__main__":
    raise SystemExit(main())
