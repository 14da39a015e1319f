"""spark-submit entry point for the extraction pipeline.

    spark-submit --master <cluster> \
        --py-files pdf_parser_spark.zip \
        jobs/extract_job.py \
        --input  <pages parquet/iceberg path> \
        --output <output root> \
        [--partitions N] [--no-resume] [--run-id ID] [--demo-corpus R]

With --demo-corpus R the job synthesizes the fixture page corpus
(repeat=R) instead of reading --input — a self-contained smoke/bench
run on any cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--demo-corpus", type=int, default=0,
                    help="synthesize fixture corpus ×N instead of --input")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from pdf_parser_spark.pipeline import run_extraction_job

    if args.demo_corpus:
        from pdf_parser_spark.pages_source import fixture_pages_df
        pages = fixture_pages_df(spark, repeat=args.demo_corpus)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("either --input or --demo-corpus is required")

    result = run_extraction_job(
        spark, pages, args.output,
        resume=not args.no_resume,
        partitions=args.partitions,
        run_id=args.run_id,
    )
    print(json.dumps({"docs": result["docs"], "txs": result["txs"],
                      "out_dir": result["out_dir"]}))


if __name__ == "__main__":
    main()
