"""Generic A/B timing harness (round-11): time any catalog queries at
sf0.1 in ONE session with the standing environment-control query first
(VERDICT r9 protocol: every A/B note carries a same-session control).

Usage: python scripts/ab_queries.py <label> <query ...>
Prints one JSON line per query (min-of-2, bench methodology) plus a
summary line. SPARK_GRAFT_SF_DIR overrides the data dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.session import get_spark  # noqa: E402
from simpletasks_data_spark import queries as catalog  # noqa: E402

CONTROL = "q1_pricing_summary"


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab-queries",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    catalog.load(spark, sf_dir, "region").count()
    q = catalog.queries()
    out = {}
    for name in [CONTROL] + names:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            q[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(json.dumps({"query": name, "sec": out[name]}), flush=True)
    print(json.dumps({"label": label, "timings": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
