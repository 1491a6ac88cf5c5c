"""Bucketed storage for co-located joins.

Repeated fact-fact joins (KG triples ⨝ documents on url, entities ⨝
mentions on url) shuffle BOTH sides on every query. Bucketing writes
the table pre-partitioned (and pre-sorted) by the join key, so any
later equi-join between tables bucketed the same way reads co-located
buckets with NO exchange — the shuffle is paid once at write time and
amortized over every downstream query. This is the storage-layout half
of the shuffle budget at 100 TB: stage outputs that will be joined on
url again (documents_clean, triples_typed, kg) should land bucketed.

Spark-native bucketing (no Hive needed): `bucketBy(...).saveAsTable`
records bucket metadata in the catalog; the reader reports the hash
distribution to the planner, which elides the Exchange (see
tests/test_plans.py::test_bucketed_join_avoids_exchange for the plan
proof). Pick n_buckets so one bucket of the LARGEST table fits an
executor core's working set (~128-256 MB compressed) — for 100 TB of
triples that is O(100k) buckets, which Spark handles fine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "url",
    n_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Write df as a bucketed (and bucket-sorted) parquet table. An
    explicit path makes it external (tests use tmp dirs); otherwise it
    lands in the session warehouse."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
