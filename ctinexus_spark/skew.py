"""Hot-key skew handling: salted repartition + two-phase aggregation.

north_rule: "Skew from hot domains is handled with salted
repartitioning and AQE skew-join splitting." AQE handles joins
(spark.sql.adaptive.skewJoin.enabled, on in session.py); this module
covers the groupBy side, where one hot domain would pin a single
reducer.

Pattern: add salt = pmod(xxhash64(key, salt_source), B), aggregate on
(key, salt) — map-side partial + B-way fan-out of the hot key — then
aggregate the partials on key alone. The second shuffle carries only
|keys| × B rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_source: str, buckets: int = 32, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, buckets) from a high-cardinality
    column (e.g. url salts its domain's hot key)."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(F.col(salt_source)), F.lit(buckets)).cast("int"))


def salted_count(
    df: DataFrame,
    key: str,
    salt_source: str,
    buckets: int = 32,
) -> DataFrame:
    """Skew-safe `groupBy(key).count()` via two-phase aggregation."""
    salted = with_salt(df, salt_source, buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(key).agg(F.sum("_partial").cast("bigint").alias("n"))


def salted_agg(
    df: DataFrame,
    key: str,
    salt_source: str,
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 32,
) -> DataFrame:
    """General two-phase skew-safe aggregation: `partial_aggs` run per
    (key, salt); `final_aggs` combine the partials per key (they must
    reference the partial alias names)."""
    salted = with_salt(df, salt_source, buckets)
    partial = salted.groupBy(key, "_salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)


def repartition_salted(df: DataFrame, key: str, salt_source: str, buckets: int = 32) -> DataFrame:
    """Repartition by (key, salt) so one hot key spreads over
    `buckets` partitions — use before per-partition work that doesn't
    need key co-location (e.g. batched model inference)."""
    salted = with_salt(df, salt_source, buckets)
    return salted.repartition(F.col(key), F.col("_salt")).drop("_salt")
