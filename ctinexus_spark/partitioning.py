"""Input-split hygiene + materialization barriers shared by the
scan-heavy and multi-consumer operators.

Inputs arriving as a handful of large files (or one small file) would
serialize every downstream Arrow pass / explode onto a few cores —
repartition up to ~2 tasks/core when the scan is under-split. At
100 TB the scan naturally yields thousands of splits and this is a
no-op (the partition probe is plan-time only; no job runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan_partitions(df: DataFrame) -> int | None:
    """Planned partition count, Connect-safe: prefer the classic
    rdd.getNumPartitions probe (exact, plan-time only); under Spark
    Connect (no .rdd) fall back to the scan's file count — the
    quantity the probe exists to detect (few-files inputs). Returns
    None when neither is knowable (non-file source on Connect):
    callers then repartition unconditionally, the safe default."""
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        pass
    try:
        files = df.inputFiles()
        return len(files) if files else None
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    spark = df.sparkSession
    try:
        default = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext — conf-driven
        default = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    target = min_parallelism or default * 2
    current = _plan_partitions(df)
    if current is None or current < target:
        df = df.repartition(target)
    return df


def barrier(df: DataFrame) -> DataFrame:
    """Eager materialization barrier for multi-consumer branch points
    (a lazy persist would race inside a single multi-consumer job and
    compute the upstream pass twice).

    Local mode: localCheckpoint — blocks live on executors and are
    GC-reclaimed once unreferenced (no cache-manager leak). TRADEOFF:
    localCheckpoint truncates lineage, so losing an executor after
    materialization fails the job instead of recomputing — acceptable
    in a single-JVM local run, not on a 1000-executor cluster.

    Clustered deployments set a reliable checkpoint dir
    (spark.sparkContext.setCheckpointDir on HDFS/S3); when one is
    configured this helper switches to reliable .checkpoint(), whose
    blocks survive executor loss."""
    try:
        has_dir = df.sparkSession.sparkContext.getCheckpointDir() is not None
    except Exception:  # Spark Connect: localCheckpoint is the only option
        has_dir = False
    if has_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
