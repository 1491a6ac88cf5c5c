"""spark-submit entrypoint for the KG-construction pipeline.

Ship the package alongside (north_rule: "ships as spark-submit
--py-files with no per-row Python"):

    python3 jobs/package_pyfiles.py                       # → dist/ctinexus_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/ctinexus_spark.zip \
        jobs/run_kg.py --input <documents dir> --output <kg dir> \
        --checkpoint <stage-store dir> [--lang en] [--resume]

With --resume the job continues from the last committed stage
snapshot (checkpoint.StageStore); without it the full fused pipeline
runs and writes the KG in one pass.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir (url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True, help="KG output parquet dir")
    ap.add_argument("--checkpoint", default=None, help="StageStore root for resumable runs")
    ap.add_argument("--lang", default="en")
    ap.add_argument("--resume", action="store_true", help="use stage checkpoints + anti-join resume")
    args = ap.parse_args()

    # imports AFTER arg parsing so --help works without the zip
    from pyspark.sql import SparkSession

    from ctinexus_spark.config import PipelineConfig
    from ctinexus_spark.model import StubModel
    from ctinexus_spark.operators.fused import fused_kg
    from ctinexus_spark.operators.normalize import normalize_documents

    spark = SparkSession.builder.appName("ctinexus-kg").getOrCreate()
    cfg = PipelineConfig()
    model = StubModel(cfg)  # swap for a real ModelClient in production
    documents = spark.read.parquet(args.input)

    if args.resume:
        from ctinexus_spark.checkpoint import StageStore
        from ctinexus_spark.pipeline import run_pipeline_checkpointed

        store = StageStore(args.checkpoint or (args.output + "_stages"))
        kg = run_pipeline_checkpointed(spark, documents, model, store, cfg, lang_filter=args.lang)
    else:
        docs = normalize_documents(documents, lang_filter=args.lang)
        kg = fused_kg(docs, model, cfg)

    kg.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"KG rows written: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
