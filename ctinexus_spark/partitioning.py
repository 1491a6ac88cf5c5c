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


def keyed_partitions(df: DataFrame) -> int:
    """Partition count for an explicit keyed repartition (~2 tasks per
    core, the ensure_parallelism target). A BARE repartition(key) is an
    AQE-coalescible shuffle: on small inputs it collapses to ~1
    partition and serializes every narrow operation downstream of it —
    including Arrow passes (measured round 6: the align stage doubled).
    Passing the count pins it; the value is derived from the session,
    never hard-coded."""
    spark = df.sparkSession
    try:
        return spark.sparkContext.defaultParallelism * 2
    except Exception:  # Spark Connect: no sparkContext — conf-driven
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))


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


def grouped_map_stitched(
    df: DataFrame, key: str, process, schema, assume_grouped: bool = False
) -> DataFrame:
    """The cheap replacement for groupBy(key).applyInPandas(...) when
    groups are numerous and small (per-document work): one Arrow
    exchange per BATCH of many groups instead of per group — the
    grouped-map path pays ~2 ms of pandas/Arrow overhead per group
    (measured; see operators/fused.py), which is 10^12 × 2 ms at
    web scale.

    `process` receives pandas frames containing only WHOLE key-groups
    (possibly many per call; split them with pdf.groupby(key)) and
    returns a frame matching `schema` by column name.

    Shape: repartition(key) → sortWithinPartitions(key) → mapInPandas.
    Arrow caps batches at arrow.maxRecordsPerBatch, so one group can
    straddle a batch boundary; rows arrive sorted by key, so each
    batch's trailing group is held back and stitched onto the next
    batch — every group is processed whole regardless of batch size.

    assume_grouped=True (optimization round 6, guide §2.4) skips the
    repartition AND the sort: the CALLER asserts that every key-group
    already lives whole and contiguous inside one partition — true for
    the direct output of another grouped_map_stitched on the same key
    (whole groups are emitted sequentially per task and narrow ops
    preserve that), which is exactly the align_entities → analyze_graph
    hand-off. The stitch logic only needs group contiguity, not a
    global sort, so correctness is unchanged; the exchange of the full
    row set (at web scale: every aligned node row) disappears. Do NOT
    pass True for inputs whose grouping you cannot prove: a key split
    across partitions would be processed once per fragment."""
    import pandas as pd

    def run(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None:
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            last = pdf[key].iloc[-1]
            boundary = pdf[key] == last
            pending = pdf[boundary]
            work = pdf[~boundary]
            if len(work):
                yield process(work)
        if pending is not None and len(pending):
            yield process(pending)

    if assume_grouped:
        return df.mapInPandas(run, schema=schema)
    # DELIBERATELY a bare (AQE-coalescible) repartition: for the pure
    # Arrow passes behind this helper, fewer+larger post-shuffle
    # partitions measured FASTER (fused kg ~3.4s vs ~4.0s with a pinned
    # 2x-cores count — larger batches amortize per-task pandas/model
    # overhead, and there are no JVM sorts downstream to parallelize).
    # Contrast mint_mentions, which pins its count because two window
    # SORTS ride its exchange (see keyed_partitions docstring).
    return (
        df.repartition(key)
        .sortWithinPartitions(key)
        .mapInPandas(run, schema=schema)
    )


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


def release_checkpoint_blocks(spark, blocking: bool = False) -> int:
    """Unpersist every JVM-side persistent RDD; returns how many.

    localCheckpoint blocks are pinned by the JVM for the LIFETIME of
    the session: measured on this stack (Spark 4.1 / py4j ClientServer),
    neither spark.catalog.clearCache(), nor dropping every Python
    wrapper + gc.collect(), nor an explicit py4j detach + System.gc
    releases them — barriered iterative queries therefore grow
    executor storage monotonically across repeated runs in one
    session, squeezing the unified memory pool until shuffles spill
    (bench round 5: dedup_clusters_cc warm median 31 s vs cold 4.7 s).

    SAFETY CONTRACT: call ONLY at a point where no previously built
    DataFrame will be re-executed — a barriered frame has truncated
    lineage, so unpersisting it makes any later action on it fail
    instead of recompute. Bench harnesses between measurements and
    batch jobs at stage boundaries satisfy this; a live interactive
    session generally does not.
    """
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
    except Exception:  # Spark Connect: no JVM handle — nothing we can do
        return 0
    n = 0
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(blocking)
        n += 1
    return n
