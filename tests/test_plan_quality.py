"""Physical-plan quality gates (SURVEY.md §4): these assertions pin the
optimizer behavior that matters at 100 TB — if a refactor breaks
column pruning or pushdown, this fails before any cluster does.
"""

import os
import shutil

import pytest

from pyspark.sql import functions as F

from pdf_parser_spark.pages_source import fixture_pages_df


@pytest.fixture(scope="module")
def pages_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages")
    fixture_pages_df(spark).write.parquet(path)
    return path


def _explain(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        spark_explain_mode(df.sparkSession))


def spark_explain_mode(spark):
    jvm = spark._jvm
    return jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")


def test_column_pruning_html_never_read(spark, pages_parquet):
    """A metrics-only query must not scan payload bytes: `html`
    dominates table size; reading it for a count-by-lang would be the
    single worst plan regression possible."""
    df = spark.read.parquet(pages_parquet).groupBy("lang").count()
    plan = _formatted(df)
    scan = plan[plan.index("Scan parquet"):]
    read_schema = scan[scan.index("ReadSchema"):].splitlines()[0]
    assert "html" not in read_schema, read_schema
    assert "text" not in read_schema, read_schema


def test_predicate_pushdown_reaches_scan(spark, pages_parquet):
    df = spark.read.parquet(pages_parquet).filter(F.col("lang") == "es") \
        .select("url")
    plan = _formatted(df)
    assert "PushedFilters" in plan
    pushed = plan[plan.index("PushedFilters"):].splitlines()[0]
    assert "lang" in pushed, pushed


def test_parse_pages_prunes_lang(spark, pages_parquet):
    """The extraction pipeline never needs `lang`; the scan must not
    read it."""
    from pdf_parser_spark.pipeline import parse_pages

    df = parse_pages(spark.read.parquet(pages_parquet))
    plan = _formatted(df)
    scan = plan[plan.index("Scan parquet"):]
    read_schema = scan[scan.index("ReadSchema"):].splitlines()[0]
    assert "lang" not in read_schema, read_schema
    assert "html" in read_schema  # payloads ARE needed here


def test_parse_pages_shuffle_budget(spark, pages_parquet):
    """Exactly ONE exchange — the single seeded over-partitioned
    url-hash repartition (pipeline.salted_repartition).  A second
    shuffle anywhere on the payload path doubles the bytes moved at
    100 TB; this gate fails before a cluster does."""
    from pdf_parser_spark.pipeline import parse_pages

    df = parse_pages(spark.read.parquet(pages_parquet))
    plan = _explain(df)
    assert plan.count("Exchange") == 1, plan
    # round 6: the worker is arrow-native (MapInArrow); accept either
    # Python-batch operator spelling
    low = plan.lower()
    assert ("mapinpandas" in low or "mapinarrow" in low
            or "pythonmapinarrow" in low), plan


def test_no_cartesian_product_in_any_registered_query(spark):
    """Registry-wide scale gate: no query plan may contain a
    CartesianProduct (both-sides-big cross product).  The ANN
    assignment joins are deliberate k-row cross joins — they must plan
    as BroadcastNestedLoopJoin (tiny side shipped), never cartesian."""
    import query_registry

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        spark.read.parquet("/root/testdata/sf0.001/%s.parquet" % t) \
            .createOrReplaceTempView(t)
    offenders = []
    for name, pair in query_registry.QUERY_SQL.items():
        plan = _explain(spark.sql(pair["spark"]))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert offenders == []


def test_resume_anti_join_broadcasts_small_side(spark, pages_parquet):
    pages = spark.read.parquet(pages_parquet)
    done = pages.select("url").limit(5)
    pending = pages.join(F.broadcast(done), "url", "left_anti")
    plan = _explain(pending)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_relational_flagship_wholestage_codegen(spark):
    """The expression pipeline (lexers, CASE chains) must stay inside
    whole-stage codegen — a fallback to interpreted mode would show up
    here before it shows up as a 10x regression at scale."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "se", pathlib.Path(__file__).parent.parent / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    plan = _explain(df)
    # codegen stages print as `*(n)` in the plan string
    assert plan.count("*(") >= 5, plan[:2000]
    # segmentation window + per-doc sort window are the only shuffles
    # beyond the scan: one hash-partitioning by doc_id suffices for both
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_bucketed_url_joins_are_shuffle_free(spark):
    """The 100-TB join strategy made concrete: the resume anti-join and
    the validation join run against url-bucketed tables with ZERO
    Exchange in the plan — the keys are co-located at WRITE time, so
    the join moves no bytes at read time.  Iceberg's
    ``bucket(1024, url)`` partition transform (io_tables.ICEBERG_DDL)
    is the cluster form of exactly this layout; Spark's native bucketed
    parquet tables (bucketBy + saveAsTable) prove the plan shape in the
    sandbox, where no Iceberg jars exist.  Broadcast is disabled so the
    gate can't pass by shipping the small side instead."""
    n_buckets = 8
    # A killed session can leave the warehouse directory behind while the
    # in-memory catalog forgets the table; saveAsTable then fails with
    # LOCATION_ALREADY_EXISTS.  Drop both halves before writing.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    for t in ("pages_bucketed_t", "committed_bucketed_t"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(
            os.path.join(warehouse.replace("file:", ""), t), ignore_errors=True)
    pages = fixture_pages_df(spark).select("url", "lang")
    committed = pages.filter(F.crc32(F.col("url")) % 3 == 0).select("url")
    (pages.write.bucketBy(n_buckets, "url").sortBy("url")
        .mode("overwrite").saveAsTable("pages_bucketed_t"))
    (committed.write.bucketBy(n_buckets, "url").sortBy("url")
        .mode("overwrite").saveAsTable("committed_bucketed_t"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("pages_bucketed_t")
        b = spark.table("committed_bucketed_t")

        resume = a.join(b, "url", "left_anti")
        plan = _explain(resume)
        assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
        assert "Exchange" not in plan, plan

        validation = a.join(b, "url", "inner")
        plan2 = _explain(validation)
        assert "Exchange" not in plan2, plan2

        # and the co-location is real, not just a plan claim
        assert resume.count() + validation.count() == pages.count()

        # the same joins WITHOUT bucketing shuffle both sides — the
        # contrast that quantifies what the layout buys at 100 TB
        pa, pb = a.localCheckpoint(), b.localCheckpoint()
        plan3 = _explain(pa.join(pb, "url", "left_anti"))
        assert "Exchange hashpartitioning" in plan3, plan3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS pages_bucketed_t")
        spark.sql("DROP TABLE IF EXISTS committed_bucketed_t")


def test_decontam_gram_screen_broadcasts_eval_side(spark):
    """The 13-gram contamination screen must plan the (small) eval-gram
    side as a broadcast — a shuffled join here would move every train
    gram twice at 10^12 docs."""
    import query_registry

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
    plan = _explain(spark.sql(
        query_registry.QUERY_SQL["decontam_13gram"]["spark"]))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_query_terms_broadcast(spark):
    """The BM25 term join must broadcast the (tiny) query-term side —
    the inverted-index posting fetch; shuffling every token of 10^12
    docs to meet a few thousand query terms would be the worst plan."""
    import query_registry

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
    plan = _explain(spark.sql(
        query_registry.QUERY_SQL["bm25_topk"]["spark"]))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quality_classifier_model_broadcast(spark):
    """Classifier inference must broadcast the tiny weight table —
    the sparse dot product is a posting-fetch shape, never a shuffle
    of the token stream to meet a 13-row model."""
    import query_registry

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
    plan = _explain(spark.sql(
        query_registry.QUERY_SQL["quality_classifier"]["spark"]))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_robots_wildcard_rules_broadcast(spark):
    """The wildcard-rule match is a regex theta-join against a 5-row
    ruleset: it must plan as BroadcastNestedLoopJoin (rules shipped),
    never a cartesian of two big sides."""
    import query_registry

    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .createOrReplaceTempView("documents")
    plan = _explain(spark.sql(
        query_registry.QUERY_SQL["robots_wildcard_filter"]["spark"]))
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
