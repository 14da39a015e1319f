"""Round-6 measurement sidecar (guide §1): per-query timing + plan dumps.

bench.py is FROZEN for the driver's measurement; this file exists so the
optimization round can (a) time individual queries in isolation with the
same count() methodology, (b) time them against the noop sink (guide
§1.4 — computes every column, excludes sink effects), and (c) capture
.explain("formatted") into plans/r06/<query>_<tag>.txt for the
before/after evidence OPTIMIZATION_r06.md cites.

Usage:
    python bench_extra.py --queries ann_brute_big,span_neardup --tag before
    python bench_extra.py --queries fidelity_pipeline --tag after --noop
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True,
                    help="comma-separated query names (all_queries keys)")
    ap.add_argument("--tag", default="probe",
                    help="suffix for plans/r06/<q>_<tag>.txt")
    ap.add_argument("--noop", action="store_true",
                    help="also time a noop-sink write per query")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    import importlib.util

    from pdf_parser_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    entry_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry_mod)

    spark = get_spark(app="bench_extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.all_queries()

    plans_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in args.queries.split(","):
        name = name.strip()
        if name == "fidelity_pipeline_bench":
            # the bench.py extraction row: parse_pages over the
            # replicated corpus (REPEAT=40), persisted input
            from pdf_parser_spark.pages_source import fixture_pages_df
            from pdf_parser_spark.pipeline import parse_pages
            rep = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "40"))
            pages = fixture_pages_df(spark, repeat=rep).persist()
            pages.count()
            df = parse_pages(pages)
        else:
            df = queries[name](spark, SF_DIR)
        spark.sparkContext.setJobDescription("%s [%s]" % (name, args.tag))
        if not args.no_plans:
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(
                    plans_dir, "%s_%s.txt" % (name, args.tag)), "w") as fh:
                fh.write(plan)
        # bench.py rebuilds the DataFrame per timed invocation
        # (callables like ann_ivf_amortized do eager fit/index work at
        # build time) — match that exactly
        def build(name=name):
            if name == "fidelity_pipeline_bench":
                from pdf_parser_spark.pipeline import parse_pages
                return parse_pages(pages)
            return queries[name](spark, SF_DIR)

        build().count()  # warm (JIT/codegen), matching bench.py protocol
        runs = []
        for _ in range(args.runs):
            t0 = time.time()
            build().count()
            runs.append(round(time.time() - t0, 3))
        rec = {"count_best": min(runs), "count_runs": runs}
        if args.noop:
            nruns = []
            for _ in range(args.runs):
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                nruns.append(round(time.time() - t0, 3))
            rec["noop_best"] = min(nruns)
            rec["noop_runs"] = nruns
        out[name] = rec
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: rec}))
    print(json.dumps({"tag": args.tag, "sf_dir": SF_DIR, "cpus": CPUS,
                      "loadavg": os.getloadavg()[0], "results": out}))


if __name__ == "__main__":
    main()
