"""Structured Streaming variant of the extraction pipeline.

The reference is request/response (SURVEY.md §2.10 — no watermarks or
cross-document state exist), so the streaming job is the SAME dataflow
run incrementally: every operator is per-url, no watermark is ever
required, and ``Trigger.AvailableNow`` drains whatever landed since
the last checkpoint then stops — incremental ingestion with exactly
the batch semantics.

``foreachBatch`` routes each micro-batch through the batch writer
(TableIO snapshot appends), so resume/lineage behavior is identical to
the batch job; the streaming checkpoint adds source-offset tracking on
top (files already drained are never re-read, even without the
anti-join).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from .io_tables import TableIO
from .pages_source import PAGES_SCHEMA
from .pipeline import parse_pages, split_outputs


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: Optional[str] = None,
    partitions: Optional[int] = None,
):
    """Drain all available page files → parsed tables; returns the
    finished StreamingQuery (already awaited)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    io = TableIO.from_conf(spark, out_dir)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        parsed = parse_pages(batch_df, partitions).persist()
        try:
            txs, docs = split_outputs(parsed)
            if docs.count():
                io.append_many(
                    {"transactions": txs, "doc_metrics": docs},
                    run_id="stream-%d" % batch_id,
                )
        finally:
            parsed.unpersist()

    query = (
        stream.writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
