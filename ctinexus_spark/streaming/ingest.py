"""Structured-Streaming front-end for the KG pipeline.

The reference is strictly batch (SURVEY.md §2.7: no streaming
operators); streaming enters this rebuild as the *ingestion* shape a
continuously-crawled corpus needs:

- `stream_kg`: readStream over a documents directory → foreachBatch
  runs the SAME fused batch pipeline per micro-batch and appends to a
  parquet KG sink. foreachBatch is the right tool because EA/LP are
  per-document (no cross-batch state), every batch operator is reused
  verbatim, and the streaming checkpoint gives exactly-once appends —
  the streaming twin of checkpoint.py's batch resume.
- `windowed_event_counts`: watermarked tumbling-window aggregation
  over an events stream (late data dropped after the watermark) —
  the standard stateful-streaming shape for the metrics feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ctinexus_spark.config import PipelineConfig
from ctinexus_spark.operators.fused import fused_kg
from ctinexus_spark.operators.normalize import normalize_documents

DOCUMENTS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_kg(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    model,
    config: PipelineConfig | None = None,
    lang_filter: str | None = "en",
):
    """Continuous KG construction: new parquet files under input_dir
    flow through the fused pipeline into a parquet KG sink. Returns
    the StreamingQuery (caller awaits/termination-manages it)."""
    cfg = config or PipelineConfig()
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = normalize_documents(batch_df, lang_filter=lang_filter)
        kg = fused_kg(docs, model, cfg).withColumn("_batch_id", F.lit(batch_id))
        kg.write.mode("append").parquet(output_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type over a
    streaming events source (ts timestamp, event_type string)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
