"""SparkSession factory tuned for the local[32] test harness.

On a real cluster the same knobs apply, minus master/driver-memory:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
Arrow on (Pandas-UDF exchange), UTC session timezone (fixtures carry
ns/ms timestamps; see FIXTURES.md "Oracle parity rules").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "vectordb-rag-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions sized to cores at test scale; at 100 TB this is
        # left to AQE coalescing from an initial high value instead.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: tasks are always PROCESS_LOCAL — don't wait for locality
        .config("spark.locality.wait", "0")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
