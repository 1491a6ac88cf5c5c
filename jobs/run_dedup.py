"""spark-submit entrypoint for the near-dup keep-list funnel — the
second shipped flagship (MinHash sketch → LSH band buckets →
per-bucket star edges → distributed connected components → min-id
survivors):

    python3 jobs/package_pyfiles.py                       # → dist/ctinexus_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/ctinexus_spark.zip \
        jobs/run_dedup.py --input <documents dir> --output <keeplist dir> \
        [--id-col doc_id] [--text-col text] [--max-bucket 1000] \
        [--mode keeplist|candidates|clusters]

Modes:
    keeplist   (default) one row per SURVIVING document id
    candidates verified-pair input: (a_id, b_id) LSH candidate pairs
    clusters   (vertex, component) duplicate-cluster labels
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--output", required=True, help="output parquet dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--max-bucket", type=int, default=1000)
    ap.add_argument("--mode", choices=["keeplist", "candidates", "clusters"],
                    default="keeplist")
    args = ap.parse_args()

    # imports AFTER arg parsing so --help works without the zip
    from pyspark.sql import SparkSession

    from ctinexus_spark.graph.components import connected_components
    from ctinexus_spark.operators.dedup import (
        dedup_keep_list,
        lsh_candidates,
        lsh_star_edges,
    )

    spark = SparkSession.builder.appName("ctinexus-dedup").getOrCreate()
    docs = spark.read.parquet(args.input)

    if args.mode == "keeplist":
        out = dedup_keep_list(docs, args.id_col, args.text_col, args.max_bucket)
    elif args.mode == "candidates":
        out = lsh_candidates(docs, args.id_col, args.text_col, args.max_bucket)
    else:
        edges = lsh_star_edges(docs, args.id_col, args.text_col, args.max_bucket)
        out = connected_components(edges, "a_id", "b_id")

    out.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"{args.mode} rows written: {n}")
    spark.stop()


if __name__ == "__main__":
    main()
