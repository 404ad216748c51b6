"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the configs below are chosen
so the same logical plans scale to a real cluster:

- AQE on: runtime join-strategy switches, partition coalescing, and skew
  join handling — the main defense against skewed keys at 100 TB.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  AQE coalescing makes the initial number far less sensitive.
- Arrow enabled: every Pandas UDF / applyInPandas transfer is vectorized.
- Session timezone pinned to UTC so results compare bit-for-bit against
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "news_graph_rag_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = cpus or DEFAULT_CPUS
    # Executor Python workers unpickle UDF closures that reference this
    # package; make sure they can import it even when the driver script
    # runs from elsewhere. (On a real cluster: ship a wheel via --py-files;
    # locally PYTHONPATH is inherited by the worker daemon.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # parquet scans: split files so 32 threads engage even on one file
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.parquet.filterPushdown", "true")
        # TESTDATA events.parquet stores TIMESTAMP(NANOS); Spark can't map
        # it natively — read as long and convert in catalog.load()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
