"""Capture .explain('formatted') output for a list of catalog queries.

Usage:
    python scripts/capture_plans.py <repo_root> <out_dir> <suffix> <query ...>

Writes <out_dir>/<query>_<suffix>.txt for each query. Runs against
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1). The repo_root arg
lets the same script capture plans from a historical worktree (the
"before" snapshot) and from HEAD (the "after" snapshot).
"""
import os
import sys

repo, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, repo)

from simpletasks_data_spark.session import get_spark  # noqa: E402
from simpletasks_data_spark import queries as catalog  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.makedirs(out_dir, exist_ok=True)
spark = get_spark(app_name="plan-capture")
q = catalog.queries()
for name in names:
    try:
        df = q[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception as exc:  # capture the failure instead of dying
        plan = f"PLAN CAPTURE FAILED: {exc!r}"
    with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(f"captured {name}_{suffix} ({len(plan)} chars)", flush=True)
spark.stop()
