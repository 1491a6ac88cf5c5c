"""Stage checkpointing + resume.

north_rule: every stage writes per-partition lineage + metrics and the
job "resumes from the last committed snapshot checkpoint".

In production this is Iceberg (`df.writeTo(table).append()` + snapshot
ids); the sandbox has no Iceberg runtime jar, so the same contract is
implemented on parquet directories with atomic commit markers:

    <root>/<stage>/data/*.parquet     (the stage output)
    <root>/<stage>/_COMMITTED         (written only after success)

Resume = anti-join the input's urls against a committed stage output —
only unprocessed documents re-run (the Iceberg version swaps the
directory scan for a snapshot read; the dataflow is identical).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _marker(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "_COMMITTED")

    def is_committed(self, stage: str) -> bool:
        return os.path.exists(self._marker(stage))

    def commit(self, df: DataFrame, stage: str, partition_by: list[str] | None = None) -> str:
        """Write a stage output atomically: data first, marker last.
        A crash mid-write leaves no marker → the stage re-runs."""
        out = self._dir(stage)
        data = os.path.join(out, "data")
        if os.path.exists(out) and not self.is_committed(stage):
            shutil.rmtree(out)  # torn previous attempt
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data)
        with open(self._marker(stage), "w") as f:
            json.dump({"stage": stage, "committed_at": time.time()}, f)
        return data

    def load(self, spark: SparkSession, stage: str) -> DataFrame | None:
        if not self.is_committed(stage):
            return None
        path = os.path.join(self._dir(stage), "data")
        # stage dirs are rewritten by resume merges: drop any cached
        # file listings / plan caches that still reference this path
        spark.catalog.refreshByPath(path)
        return spark.read.parquet(path)

    def remaining(self, spark: SparkSession, inputs: DataFrame, stage: str, key: str = "url") -> DataFrame:
        """Input rows not yet present in the committed stage output
        (left-anti join on the key) — the resume work-list."""
        done = self.load(spark, stage)
        if done is None:
            return inputs
        return inputs.join(done.select(key).distinct(), key, "left_anti")

    def run_stage(
        self,
        spark: SparkSession,
        stage: str,
        inputs: DataFrame,
        transform,
        key: str = "url",
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Resume-aware stage execution: process only missing keys,
        append to prior committed output, re-commit."""
        todo = self.remaining(spark, inputs, stage, key)
        prior = self.load(spark, stage)
        fresh = transform(todo)
        if prior is not None:
            # append semantics: union prior output with new results
            combined_dir = self._dir(stage) + "_next"
            fresh.write.mode("overwrite").parquet(os.path.join(combined_dir, "fresh"))
            fresh_re = spark.read.parquet(os.path.join(combined_dir, "fresh"))
            merged = prior.unionByName(fresh_re)
            self_dir = self._dir(stage)
            merged.write.mode("overwrite").parquet(os.path.join(combined_dir, "data"))
            if os.path.exists(self_dir):
                shutil.rmtree(self_dir)
            os.makedirs(self_dir, exist_ok=True)
            shutil.move(os.path.join(combined_dir, "data"), os.path.join(self_dir, "data"))
            shutil.rmtree(combined_dir)
            with open(self._marker(stage), "w") as f:
                json.dump({"stage": stage, "committed_at": time.time()}, f)
        else:
            self.commit(fresh, stage, partition_by)
        return self.load(spark, stage)


def with_lineage(df: DataFrame, stage: str) -> DataFrame:
    """Per-partition lineage columns (stage, partition id) — appended
    to stage outputs so every row is traceable to the task that
    produced it (north_rule's per-partition lineage)."""
    return df.withColumn("_stage", F.lit(stage)).withColumn(
        "_partition_id", F.spark_partition_id()
    )
