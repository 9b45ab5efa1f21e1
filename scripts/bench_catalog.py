"""One-shot FULL-CATALOG wall-clock census at sf0.1 (r6 verdict item 4):
every queries() entry timed once (single run — this is a census that
pulls >2s outliers into the headliner set, not the per-round headline
bench), written to bench_catalog.json at the repo root.

Run on an otherwise-idle machine: `python scripts/bench_catalog.py`.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from simpletasks_data_spark.session import get_spark  # noqa: E402
from simpletasks_data_spark import queries as catalog  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="simpletasks-data-spark-bench-catalog",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    catalog.load(spark, sf_dir, "region").count()
    q = catalog.queries()
    timings: dict[str, float] = {}
    for i, name in enumerate(sorted(q)):
        # Streaming queries swing 2-4x between single runs (micro-batch
        # scheduling + Python-worker spawn): min-of-2 (r7 verdict item 5)
        # so census entries don't trigger false regression hunts.
        runs = 2 if name.startswith("streaming_") else 1
        try:
            best = None
            for _ in range(runs):
                t0 = time.perf_counter()
                q[name](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as exc:  # record, keep censusing
            timings[name] = -1.0
            print(json.dumps({"query": name, "error": str(exc)[:200]}), flush=True)
        print(
            json.dumps({"i": i, "query": name, "sec": timings[name]}), flush=True
        )
    out = {
        "metric": "catalog_census_total",
        "value": round(sum(t for t in timings.values() if t > 0), 3),
        "unit": "sec",
        "n_queries": len(timings),
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
    }
    with open(os.path.join(HERE, "bench_catalog.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    print(json.dumps({"total": out["value"], "n": out["n_queries"]}), flush=True)


if __name__ == "__main__":
    main()
