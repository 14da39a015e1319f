"""Benchmark harness — one JSON line on stdout.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

* the Arrow fidelity pipeline over a replicated synthesized page corpus
  (PDF/HTML/text payloads — REAL byte-level extraction work), reported
  both as seconds and docs/sec + MB/sec;
* the relational/ops headliners (window segmentation parse, detection,
  LSH dedup, simhash, ANN top-k, sessionization, lineage rollup).

Protocol: one warm-up job first (JIT + worker spin-up excluded), then
each query timed over its full action (count / write-less collect-to-
count).  Output: {"metric", "value" (total sec), "unit", "queries",
"sf", plus extraction throughput extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "40"))

HEADLINERS = [
    "generic_relational",
    "chase_relational",
    "citi_relational",
    "c1_detect_issuer",
    "g1_block_ids",
    "dedup_lsh_pairs",
    "dedup_lsh_verified",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "multimodal_features",
    "extraction_spans",
    "events_sessions",
    "g7_lineage_rollup",
    "quality_score",
]


def main() -> None:
    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.pages_source import fixture_pages_df, \
        fixture_pages_rows
    from pdf_parser_spark.pipeline import parse_pages
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    spark = get_spark(app="bench", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    # the host is co-tenant (identical runs vary ±70% across bursts,
    # BENCH/BASELINE.md): give a burst up to 90s to drain before timing
    deadline = time.time() + int(
        os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT", "90"))
    while os.getloadavg()[0] > 6 and time.time() < deadline:
        time.sleep(5)

    # ---- warm-up: spin python workers + JIT on tiny slices (the
    # measurement protocol in BENCH/BASELINE.md: warm JVM, steady state)
    queries["g1_block_ids"](spark, "/root/testdata/sf0.001").count()
    parse_pages(fixture_pages_df(spark, repeat=1)).count()

    timings: dict[str, float] = {}

    # ---- extraction throughput (the hot path)
    rows = fixture_pages_rows(repeat=REPEAT)
    n_docs = len(rows)
    payload_bytes = sum(
        len(r[2] or b"") + len((r[3] or "").encode("utf-8")) for r in rows
    )
    pages = fixture_pages_df(spark, repeat=REPEAT).persist()
    pages.count()  # materialize input outside the timed window
    runs = []
    for _ in range(3):
        t0 = time.time()
        n_rows = parse_pages(pages).count()
        runs.append(time.time() - t0)
    extract_sec = min(runs)  # steady state (BENCH/BASELINE.md protocol)
    pages.unpersist()
    timings["fidelity_pipeline"] = round(extract_sec, 3)

    # ---- relational / ops headliners (min of 3 — machine-noise guard)
    for name in HEADLINERS:
        runs = []
        for _ in range(3):
            t0 = time.time()
            queries[name](spark, SF_DIR).count()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(json.dumps({
        "metric": "extraction+relational headline suite wall seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "extraction": {
            "docs": n_docs,
            "payload_mb": round(payload_bytes / 1e6, 2),
            "output_rows": n_rows,
            "docs_per_sec": round(n_docs / extract_sec, 1),
            "mb_per_sec": round(payload_bytes / 1e6 / extract_sec, 2),
        },
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
