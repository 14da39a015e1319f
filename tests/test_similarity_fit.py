"""The production (iterative, persisted) IVF fit must agree
cell-for-cell with the unrolled-SQL oracle form, and must plan as
broadcast joins — never a CartesianProduct."""

from pdf_parser_spark.ops.similarity import ivf_fit_df

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_fit_df_matches_sql_fit(spark):
    import query_registry

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    emb.createOrReplaceTempView("embeddings")
    got = {r.vec_id: r.cell for r in ivf_fit_df(emb).collect()}
    want = {
        r.vec_id: r.cell
        for r in spark.sql(
            query_registry.QUERY_SQL["ann_ivf_fit"]["spark"]).collect()
    }
    assert got == want
    assert len(got) == emb.count()
    assert len(set(got.values())) == 8  # all cells populated


def test_ivf_fit_df_plan_shape(spark):
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    fit = ivf_fit_df(emb, iters=1)
    plan = fit._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the k-row centroid side must be broadcast (Catalyst folds the
    # constant join key, leaving BroadcastNestedLoopJoin BuildRight —
    # correct: tiny side shipped, big side streamed)
    assert "BroadcastNestedLoopJoin BuildRight" in plan \
        or "BroadcastHashJoin" in plan
