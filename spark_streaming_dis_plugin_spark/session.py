"""SparkSession construction tuned for the local[32] test substrate.

At cluster scale the same settings apply except parallelism knobs, which
should track executor count (shuffle partitions ~= 2-3x total cores; AQE
coalesces the excess at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spark_streaming_dis_plugin_spark",
              cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    # Stage the vendored protobuf runtime BEFORE the JVM launches so
    # transformWithStateInPandas workers (which inherit the JVM's env)
    # can import google.protobuf — no-op when already resolved or when
    # the JVM exists (streaming/pbvendor.py documents the constraint).
    from .streaming.pbvendor import ensure_vendored_protobuf

    ensure_vendored_protobuf()
    return (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Idle progress events default to one per 10 s, which makes
        # every idle-detection drain pay a ~20 s tail just to SEE two
        # of them (measured, tools/profile_microbatch.py r11); the
        # drain's safety now lives in drain_available's time-based
        # idle window + count targets, not in event sparsity.
        .config("spark.sql.streaming.noDataProgressEventInterval", "250ms")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
