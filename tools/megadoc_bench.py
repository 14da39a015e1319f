"""Worst-case-document bound (SURVEY §4 / round-2 verdict ask #3): a
single ≥512 MB statement rendered as a real multi-hundred-thousand-page
PDF, driven through the SAME extract+parse path the Spark workers run,
with peak RSS and phase wall times measured in an isolated subprocess —
then through ``parse_pages`` itself mixed with the normal corpus, with
per-task durations pulled from the Spark REST API to quantify the
straggler (mega task vs median task).

The single-scan salting spreads documents across tasks, but ONE
pathological document still lands in ONE Python worker — this tool
documents what that worker pays.  Results → BENCH/MEGADOC.md.

Usage: python tools/megadoc_bench.py [mb] [out_md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORKER = r"""
import json, resource, sys, time
sys.path.insert(0, %(repo)r)
from pdf_parser_spark.fixtures import mega_statement_text
from pdf_parser_spark.pdfio.writer import text_to_pdf
from pdf_parser_spark.pdfio.extract import extract_document
from pdf_parser_spark.engine.document import parse_document

mb = %(mb)d
def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

t0 = time.time()
text = mega_statement_text(mb)
t_gen = time.time() - t0

t0 = time.time()
pdf = text_to_pdf(text, compress=True)
t_render = time.time() - t0
rss_after_render = rss_mb()
del text  # the worker only ever holds payload bytes, not source text

t0 = time.time()
doc = extract_document(pdf)
t_extract = time.time() - t0
del pdf

t0 = time.time()
tally = {}
bank, txs = parse_document(doc.text, 2024, tally=tally)
t_parse = time.time() - t0

print(json.dumps({
    "mb": mb, "pdf_mb": None, "pages": doc.pages,
    "n_chars": len(doc.text), "n_lines": tally.get("n_lines"),
    "bank": bank, "txs": len(txs), "error": doc.error,
    "t_gen_s": round(t_gen, 1), "t_render_s": round(t_render, 1),
    "t_extract_s": round(t_extract, 1), "t_parse_s": round(t_parse, 1),
    "peak_rss_mb": round(rss_mb(), 1),
    "rss_after_render_mb": round(rss_after_render, 1),
}))
"""


def engine_phase(mb: int) -> dict:
    """Isolated-subprocess measurement: ru_maxrss of THIS run only."""
    out = subprocess.run(
        [sys.executable, "-c", _WORKER % {"repo": REPO, "mb": mb}],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def spark_phase(mb: int) -> dict:
    """The mega doc through parse_pages alongside the normal corpus;
    task-duration spread from the Spark REST API."""
    import urllib.request

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_parser_spark.fixtures import mega_statement_text
    from pdf_parser_spark.pages_source import fixture_pages_rows
    from pdf_parser_spark.pdfio.writer import text_to_pdf
    from pdf_parser_spark.pipeline import parse_pages, split_outputs
    from pdf_parser_spark.session import get_spark

    pdf = text_to_pdf(mega_statement_text(mb), compress=True)
    rows = [("https://mega.test/doc0", None, pdf, None, "en")]
    for url, ts, html, text, lang in fixture_pages_rows():
        rows.append((url, None, html, text, lang))
    table = pa.table({
        "url": [r[0] for r in rows],
        "warc_ts": pa.array([None] * len(rows),
                            type=pa.timestamp("us")),
        "html": [r[2] for r in rows],
        "text": [r[3] for r in rows],
        "lang": [r[4] for r in rows],
    })
    path = "/tmp/megadoc_pages.parquet"
    pq.write_table(table, path)
    del pdf, table

    spark = get_spark(app="megadoc-bench", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    parsed = parse_pages(spark.read.parquet(path))
    txs, docs = split_outputs(parsed)
    doc_rows = docs.collect()
    wall = time.time() - t0
    mega = [r for r in doc_rows if r.url.startswith("https://mega.test")][0]

    # task-duration spread of the mapInPandas stage (REST API)
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    durs = []
    try:
        with urllib.request.urlopen(
                "%s/api/v1/applications/%s/stages?status=complete"
                % (ui, app_id)) as resp:
            stages = json.loads(resp.read())
        stage = max(stages, key=lambda s: s.get("executorRunTime", 0))
        with urllib.request.urlopen(
                "%s/api/v1/applications/%s/stages/%d/%d/taskList"
                "?length=1000" % (ui, app_id, stage["stageId"],
                                  stage["attemptId"])) as resp:
            tasks = json.loads(resp.read())
        durs = sorted(t["duration"] / 1000.0 for t in tasks)
    except Exception as exc:  # UI disabled → skip spread, keep wall
        print("REST API unavailable: %s" % exc, file=sys.stderr)
    spark.stop()
    os.unlink(path)

    med = durs[len(durs) // 2] if durs else None
    return {
        "job_wall_s": round(wall, 1),
        "mega_error": mega.error, "mega_pages": mega.pages,
        "mega_tx_count": mega.tx_count,
        "n_docs": len(doc_rows),
        "task_median_s": round(med, 2) if durs else None,
        "task_max_s": round(durs[-1], 2) if durs else None,
        "straggler_ratio": (round(durs[-1] / med, 1)
                            if durs and med else None),
    }


def main(mb: int = 512, out_md: str = "BENCH/MEGADOC.md") -> None:
    eng = engine_phase(mb)
    print("engine phase:", json.dumps(eng))
    spk = spark_phase(mb)
    print("spark phase:", json.dumps(spk))

    mbps = mb / (eng["t_extract_s"] + eng["t_parse_s"])
    with open(os.path.join(REPO, out_md), "w") as fh:
        fh.write("""# Worst-case document bound (round-3 ask #3)

A single %(mb)d MB chase-shaped statement (%(pages)s physical PDF
pages, %(n_lines)s lines) through the exact worker path.

## Isolated worker (subprocess, ru_maxrss)

| phase | wall |
|---|---|
| render to PDF (fixture prep, not worker cost) | %(t_render_s)s s |
| extract (PDF tokenizer) | %(t_extract_s)s s |
| parse (chase machine) | %(t_parse_s)s s |

* peak RSS: **%(peak_rss_mb).0f MB** — fits a 4 GB worker with >%(headroom).1fx headroom
* extraction+parse throughput on the mega doc: %(mbps).1f MB/s
* transactions recovered: %(txs)d, error: %(error)s

## Through parse_pages (local[8], normal corpus + mega doc)

* job wall: %(job_wall_s)s s, %(n_docs)d docs, mega error: %(mega_error)s
* task durations: median %(task_median_s)s s, max %(task_max_s)s s →
  straggler ratio %(straggler_ratio)s× (the mega task IS the max; the
  salted over-partitioning bounds every OTHER task near the median)

## Conclusion

One %(mb)d MB document costs one worker ~%(worker_s).0f s and
~%(peak_rss_mb).0f MB peak RSS — no OOM at the 4 GB bound and no
page-split pre-pass needed at this size; the knee would arrive via
RSS (~linear in document size), so a split pre-pass becomes necessary
around %(split_at).1f GB/doc.  tests/test_megadoc.py pins a
scaled-down version of both bounds in-suite.
""" % dict(eng, **spk,
           headroom=4096.0 / eng["peak_rss_mb"],
           mbps=mbps,
           worker_s=eng["t_extract_s"] + eng["t_parse_s"],
           split_at=mb / 1024.0 * (4096.0 / eng["peak_rss_mb"])))
    print("wrote", out_md)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512,
         sys.argv[2] if len(sys.argv) > 2 else "BENCH/MEGADOC.md")
