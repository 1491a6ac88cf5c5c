"""Input-split hygiene shared by scan-heavy operators.

Inputs arriving as a handful of large files (or one small file) would
serialize every downstream Arrow pass / explode onto a few cores —
repartition up to ~2 tasks/core when the scan is under-split. At
100 TB the scan naturally yields thousands of splits and this is a
no-op (the getNumPartitions check is plan-time only; no job runs)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism * 2
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df
