"""Run every relational query on Spark AND DuckDB and diff results —
a local replica of the driver's correctness gate.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_rows(cols, rows):
    """Column-name-sorted, order-insensitive canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(out), [cols[i] for i in order]


def main(sf_dir="/root/testdata/sf0.001", *names):
    from pdf_parser_spark.session import get_spark
    import importlib.util

    # the FULL registry: the driver contract (queries() + oracle_sql(),
    # incl. the parquet-golden-oracled Arrow paths) PLUS the retired
    # rows kept runnable via all_queries()/all_oracles()
    spec = importlib.util.spec_from_file_location(
        "spark_entry", str(REPO / "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    queries = entry.all_queries()
    oracles = entry.all_oracles()

    spark = get_spark(app="oracle-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql("CREATE VIEW %s AS SELECT * FROM '%s/%s.parquet'"
                % (t, sf_dir, t))

    selected = names or sorted(queries)
    failures = []
    for name in selected:
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print("%-24s SPARK ERROR %s" % (name, str(exc)[:200]))
            failures.append(name)
            continue
        try:
            dres = con.sql(oracles[name])
            dcols = [c for c in dres.columns]
            drows = dres.fetchall()
        except Exception as exc:
            print("%-24s DUCK ERROR %s" % (name, str(exc)[:200]))
            failures.append(name)
            continue
        s_norm, s_cols = norm_rows(scols, srows)
        d_norm, d_cols = norm_rows(dcols, drows)
        if s_cols != d_cols:
            print("%-24s COLS DIFFER %s vs %s" % (name, s_cols, d_cols))
            failures.append(name)
            continue
        if s_norm != d_norm:
            print("%-24s ROWS DIFFER (%d vs %d rows)"
                  % (name, len(s_norm), len(d_norm)))
            only_s = [x for x in s_norm if x not in set(d_norm)][:3]
            only_d = [x for x in d_norm if x not in set(s_norm)][:3]
            for x in only_s:
                print("   spark-only:", x[:160].replace("\x01", " | "))
            for x in only_d:
                print("   duck-only :", x[:160].replace("\x01", " | "))
            failures.append(name)
            continue
        print("%-24s OK  %6d rows  cols=%s" % (name, len(s_norm), s_cols))
    print("\n%d/%d queries agree" % (len(selected) - len(failures),
                                     len(selected)))
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main(*sys.argv[1:])
