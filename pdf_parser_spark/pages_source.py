"""Build the Common-Crawl-style ``pages`` input table
(url, warc_ts, html, text, lang — BASELINE input_hint) from the
fixture corpus.

Payload modes cycle deterministically per document:
  pdf   html = rendered PDF bytes, text = NULL (forces extraction)
  html  html = boilerplate-wrapped page bytes, text = NULL
  text  html = NULL, text = the statement text (pre-extracted path)

``repeat`` replicates the corpus with distinct urls for throughput
benchmarking (payload bytes rendered once per base doc, reused).
"""

from __future__ import annotations

import functools
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .fixtures import fixture_docs
from .pdfio.html_extract import text_to_html
from .pdfio.writer import text_to_pdf

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

_MODES = ("pdf", "html", "text")


@functools.lru_cache(maxsize=4)
def _rendered(modes: tuple):
    docs = fixture_docs()
    rendered = []
    for i, doc in enumerate(docs):
        mode = modes[i % len(modes)]
        if mode == "pdf":
            payload: Optional[bytes] = text_to_pdf(
                doc["text"], compress=True, objstm=(i % 2 == 0)
            )
            text = None
        elif mode == "html":
            payload = text_to_html(doc["text"], title=doc["url"])
            text = None
        else:
            payload = None
            text = doc["text"]
        rendered.append((doc, payload, text))
    return rendered


def fixture_pages_rows(repeat: int = 1,
                       modes: tuple = _MODES) -> List[tuple]:
    rendered = _rendered(modes)
    rows = []
    for rep in range(repeat):
        for doc, payload, text in rendered:
            url = doc["url"] if rep == 0 else "%s?rep=%d" % (doc["url"], rep)
            rows.append((
                url, doc["warc_ts"].replace(tzinfo=None), payload, text,
                doc["lang"],
            ))
    return rows


def fixture_pages_df(spark: SparkSession, repeat: int = 1,
                     modes: tuple = _MODES) -> DataFrame:
    return spark.createDataFrame(
        fixture_pages_rows(repeat, modes), schema=PAGES_SCHEMA
    )
