"""Deterministic A/B harness (round-11): run catalog queries and report
noise-immune execution metrics from the Spark UI REST API — stage count,
task count, shuffle read/write bytes, executor run/CPU time — instead of
wall-clock, which on this host swings 2x+ (SCALING.md round-11 variance
note). Shuffle bytes and stage/task counts are exactly reproducible for
the same plan; executorCpuTime is close to it.

Usage: python scripts/ab_metrics.py <label> <query ...>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simpletasks_data_spark.session import get_spark  # noqa: E402
from simpletasks_data_spark import queries as catalog  # noqa: E402


def _stages(base: str) -> list:
    with urllib.request.urlopen(base + "/stages?status=complete", timeout=30) as r:
        return json.load(r)


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="ab-metrics",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "20000",
        },
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    catalog.load(spark, sf_dir, "region").count()
    q = catalog.queries()
    out = {}
    for name in names:
        # warm run first: session stores / codegen, exactly like the
        # bench's min-of-2 protocol — metrics below are steady state
        q[name](spark, sf_dir).count()
        before = {s["stageId"] for s in _stages(base)}
        t0 = time.perf_counter()
        q[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        time.sleep(0.5)  # let the listener drain
        stages = [s for s in _stages(base) if s["stageId"] not in before]
        m = {
            "wall_sec": round(wall, 3),
            "n_stages": len(stages),
            "n_tasks": sum(s["numCompleteTasks"] for s in stages),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in stages) / 1e6, 2
            ),
            "shuffle_read_mb": round(
                sum(s["shuffleReadBytes"] for s in stages) / 1e6, 2
            ),
            "executor_run_sec": round(
                sum(s["executorRunTime"] for s in stages) / 1e3, 2
            ),
            "executor_cpu_sec": round(
                sum(s["executorCpuTime"] for s in stages) / 1e9, 2
            ),
        }
        out[name] = m
        print(json.dumps({"query": name, **m}), flush=True)
    print(json.dumps({"label": label, "metrics": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
