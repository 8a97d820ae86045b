"""SparkSession factory and runtime tuning.

The grading driver constructs its own SparkSession and passes it in
(``__spark_entry__.py``), so anything correctness-critical must be a
*runtime-settable* conf applied via :func:`tune` inside every query —
not a builder-time conf. Builder-time settings here only affect our own
tests/bench sessions.

Determinism-critical settings (SURVEY.md §5.4):
  - session timeZone=UTC: fixture timestamps are tz-naive (parquet
    isAdjustedToUTC=false); DuckDB treats them as naive. Any hour()/
    unix_timestamp() on the Spark side must not depend on a host tz.
  - ANSI mode on (Spark 4 default) so cast/overflow semantics match DuckDB.

Scale settings (100 TB design, tested on local[32]):
  - AQE on: runtime partition coalescing, skew-join splitting, and
    broadcast-join conversion replace hand-tuned shuffle counts.
  - Arrow on: every Python interchange (toPandas, pandas UDFs) is
    Arrow-batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are runtime-settable and applied defensively before every
#: registered query runs (the driver's session may not have them).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "true",
    # Fixture parquet timestamps are tz-naive (isAdjustedToUTC=false); pin
    # NTZ inference so the driver's session reads them the same way ours does.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bench tiers are small (sf<=0.1); AQE coalesces upward work at scale.
    "spark.sql.shuffle.partitions": "32",
    # Keep the stock 10 MB broadcast threshold: dims broadcast, facts shuffle.
    # (A 64 MB override was measured to make Spark broadcast the 600k-row
    # lineitem FACT as a hash-relation build side at bench tier — strictly
    # slower there and exactly the wrong physical shape at 100 TB.)
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
}


def enable_bench_tuning() -> None:
    """Switch RUNTIME_CONF to small-scale local-bench values (bench.py only).

    The fixture files at bench tier are 2-11 MB — under the 128 MB default
    split size, so every scan would run as ONE task on a 32-core local
    session while DuckDB parallelizes over row groups. 4 MB splits restore
    scan parallelism at this tier; 8 shuffle partitions cut scheduling
    overhead for KB-sized shuffles. These are explicitly NOT the 100 TB
    values: at scale the 128 MB default and a high partition count with AQE
    coalescing (the RUNTIME_CONF defaults) are correct — millions of 4 MB
    tasks would swamp any scheduler.
    """
    RUNTIME_CONF["spark.sql.files.maxPartitionBytes"] = str(4 * 1024 * 1024)
    RUNTIME_CONF["spark.sql.shuffle.partitions"] = "8"


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable determinism + perf confs; ignore read-only ones."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # conf not settable on this session — non-fatal
            pass
    return spark


def get_spark(app_name: str = "big-data-instagram-analysis-spark") -> SparkSession:
    """Local session for tests/bench. local[$SPARK_GRAFT_CPUS] (default 32)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    return tune(builder.getOrCreate())
