"""SparkSession factory tuned for the KG-construction workload.

Defaults are sized for the sandbox (local[32], 128 GiB) but every knob
is the one you would ship to a 1000-executor cluster: AQE on (runtime
re-planning + skew-join splitting), Arrow on (all UDFs are
pandas/Arrow batched), shuffle partitions sized to cores at small SF
(on a real cluster AQE coalesces; initial value should be ~2-3x total
cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "ctinexus-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Adaptive execution: post-shuffle coalescing + skew-join
        # splitting handle the hot-domain skew named in BASELINE.json.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF in the pipeline.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Stable timestamp behaviour for parquet round-trips.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
