"""SparkSession factory with engine defaults.

The engine targets a 1000-executor cluster reading ~100 TB; locally we run
``local[N]``. Config notes:

- AQE on (runtime coalesce / skew-join) — the reference has no optimizer at
  all (``/root/reference/simpletasks_data/importtask.py:219`` is a plain row
  loop), so every Catalyst/AQE rewrite is a free upgrade.
- ANSI mode OFF: the engine's parse semantics are "failure -> NULL (+ warn
  counter)", mirroring the reference's try/except parsers
  (``/root/reference/simpletasks_data/formatting.py:240-244``). Spark 4
  defaults ANSI on, which would raise instead.
- Session timezone pinned to UTC so timestamp results are stable across
  environments and comparable to external oracles.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "simpletasks-data-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    # Python workers must be able to import this package (pandas_udfs
    # reference it by module). Locally that means PYTHONPATH; on a real
    # cluster you'd ship a wheel / --py-files instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # catalog writes (bucketed tables) must never land in a read-only CWD
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE")
            or os.path.join(tempfile.gettempdir(), "sds_warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_confs(spark: SparkSession) -> None:
    """Re-assert the two runtime-settable semantics the engine depends on
    on a FOREIGN session (the external driver calls queries with its own
    SparkSession): non-ANSI parsing (failure -> NULL, the reference's
    try/except model) and a UTC session timezone so event-time windows
    and timestamp round-trips hash-match a UTC-naive oracle."""
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
