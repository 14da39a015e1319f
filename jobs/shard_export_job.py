"""spark-submit entry point for the training-shard export — the
deployment form of the ``epoch_shard_plan`` oracle query.

    spark-submit --master <cluster> \
        --py-files pdf_parser_spark.zip \
        jobs/shard_export_job.py \
        --input  <documents parquet path> \
        --output <shard root> \
        [--shards N] [--seed S]

Reads ``(doc_id, text)``, keys every document by md5(seed, doc_id),
assigns ``shard = key %% N``, orders each shard by the key, computes
the shard-local token prefix offsets, and writes ONE partitioned
parquet dataset (``shard=K/`` directories) ready for a sequence
writer to stream per shard.  Deterministic: the same (corpus, seed,
N) always produces byte-identical shard contents; a new seed is a
new reproducible epoch order.

Scale shape: one narrow projection (hash + token count), ONE shuffle
(repartition by shard), a per-shard sort and a per-shard window for
pos/offset — shards are independent, nothing is global.  Prints one
JSON line: {"docs": N, "shards": K, "tokens": T}.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pdf_parser_spark.session import get_spark

    spark = get_spark("shard_export")
    docs = spark.read.parquet(args.input).select("doc_id", "text")
    keyed = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.expr(
            "cast(conv(substring(md5('epoch-%d-' || cast(doc_id as"
            " string)), 1, 15), 16, 10) as bigint)" % args.seed
        ).alias("h"),
    ).withColumn("shard", (F.col("h") % args.shards).cast("int"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    plan = (
        keyed.repartition(args.shards, "shard")
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .withColumn(
            "token_offset",
            F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)).cast("long"))
        .select("doc_id", "shard", "pos", "n_tokens", "token_offset")
    )
    (plan.write.mode("overwrite").partitionBy("shard")
     .parquet(args.output))
    out = spark.read.parquet(args.output)
    stats = out.agg(
        F.count("*").alias("docs"),
        F.countDistinct("shard").alias("shards"),
        F.sum("n_tokens").alias("tokens")).collect()[0]
    print(json.dumps({"docs": stats.docs, "shards": stats.shards,
                      "tokens": int(stats.tokens)}))


if __name__ == "__main__":
    main()
