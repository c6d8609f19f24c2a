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
        # 16g measured best for the bench workload: a 48g heap made the
        # LSH-heavy keys 3-4x SLOWER (59s vs 13.5s isolated minhash) —
        # the default collector's pause behavior degrades with the
        # larger heap while the working set fits comfortably in 16g.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # A 170-query session generates enough whole-stage-codegen
        # classes to fill the JVM's default 240MB code cache, after
        # which the JIT disables itself and compute-bound queries run
        # interpreted (measured 2-5x decay on the LSH keys as the
        # suite progresses; 31s -> 16s restored with the larger cache).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g",
        )
        # Commit protocol: v2 commits task output by direct rename
        # into the destination (v1 adds a second job-level rename
        # pass), and the _SUCCESS marker is one more filesystem
        # round-trip per write that nothing here reads. Both defaults
        # date from MapReduce-on-HDFS; v2 + no marker is the standard
        # choice wherever the filesystem's rename is atomic (local FS,
        # HDFS). Measured ~4% across the DML/commit-bound keys.
        # SAFETY GATE (ADVICE r11): v2 can expose partial/duplicated
        # task output under task-attempt failure or speculation on
        # filesystems WITHOUT atomic rename (object stores). This
        # session always targets the local FS; deployments writing to
        # object storage must set SPARK_GRAFT_COMMITTER_ALGO=1 (or use
        # a cloud-native committer) — the env hook keeps the choice a
        # config, not a code edit.
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            os.environ.get("SPARK_GRAFT_COMMITTER_ALGO", "2"),
        )
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        # Cap the SQL status store: retaining 1000 executions' plan
        # graphs is pure overhead with the UI disabled.
        .config("spark.sql.ui.retainedExecutions", "16")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
