"""SparkSession factory.

Mirrors the capability of the reference's session builder
(``spark_project.py:7-14``) minus the Delta extension wiring (the
table layer here is pure PySpark, see ``table/versioned.py``).

Tuned for the local[32] test environment but with settings that are
also the right defaults on a large cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow-backed pandas
interchange, UTC session time zone for deterministic timestamp
semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "delta_lake_play_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
