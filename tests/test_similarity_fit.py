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


def test_ivf_topk_nprobe1_matches_sql(spark):
    """The production nprobe operator at nprobe=1 must reproduce the
    ann_ivf_topk SQL exactly (same fit, same ranking math)."""
    import query_registry

    from pdf_parser_spark.ops.similarity import ivf_topk_df

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    emb.createOrReplaceTempView("embeddings")
    got = sorted((r.query_id, r.rank, r.neighbor_id, repr(r.cosine))
                 for r in ivf_topk_df(emb, nprobe=1).collect())
    want = sorted((r.query_id, r.rank, r.neighbor_id, repr(r.cosine))
                  for r in spark.sql(
                      query_registry.QUERY_SQL["ann_ivf_topk"]["spark"])
                  .collect())
    assert got == want and len(got) == 40


def test_ivf_nprobe_k_recovers_brute_force(spark):
    """nprobe=k probes every cell — identical results to the
    brute-force baseline (the recall dial's upper end)."""
    import query_registry

    from pdf_parser_spark.ops.similarity import ivf_topk_df

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    emb.createOrReplaceTempView("embeddings")
    got = sorted((r.query_id, r.rank, r.neighbor_id, repr(r.cosine))
                 for r in ivf_topk_df(emb, nprobe=8).collect())
    want = sorted((r.query_id, r.rank, r.neighbor_id, repr(r.cosine))
                  for r in spark.sql(
                      query_registry.QUERY_SQL["ann_cosine_topk"]["spark"])
                  .collect())
    assert got == want


def test_ivf_candidate_reduction(spark):
    """Cell pruning must ACTUALLY cut the scored-pair count: with k=8
    cells and nprobe=1, candidates touched are the queries' own cells
    only — assert >= 3x below brute force on the real fit (cells are
    k-means-balanced, not perfectly uniform)."""
    from pdf_parser_spark.ops.similarity import ivf_index_df

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    n = emb.count()
    assignment, _ = ivf_index_df(emb)
    sizes = {r.cell: r.n for r in
             assignment.groupBy("cell").count()
             .withColumnRenamed("count", "n").collect()}
    qcells = [r.cell for r in
              assignment.filter("vec_id < 8").collect()]
    ivf_pairs = sum(sizes[c] - 1 for c in qcells)
    brute_pairs = 8 * (n - 1)
    assert brute_pairs / ivf_pairs >= 3.0, (brute_pairs, ivf_pairs, sizes)


def test_ivf_index_append_then_serve_exact(spark, tmp_path):
    """Incremental index lifecycle: fit on the first 400 vectors,
    persist, append the remaining 100 WITHOUT refitting (broadcast
    centroid assignment only), then serve with nprobe=k — which is
    exact brute force over everything the index holds — and compare
    against fresh top-k over the full corpus computed independently.
    Also: the appended vectors must land in the same cells the
    persisted centroids imply."""
    from pdf_parser_spark.ops.similarity import (
        _ivf_fit_impl, ivf_index_append, ivf_index_write,
        ivf_persisted_topk,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    base = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
               " * 1000000.0) AS BIGINT))").alias("qv"))
    part_a = base.filter("vec_id < 400")
    part_b = base.filter("vec_id >= 400")

    k = 8
    vectors_a, centroids = _ivf_fit_impl(part_a, k, 2, quantized=True,
                                         carry_qv=True)
    idx = str(tmp_path / "ivf_idx")
    ivf_index_write(spark, idx, vectors_a, centroids, k)
    ivf_index_append(spark, idx, part_b)

    # the index now holds the full corpus, cell-assigned
    vectors = spark.read.parquet(idx + "/vectors")
    assert vectors.count() == 500
    # appended rows sit in their centroid-nearest cell
    cents = {r.cell: r.cv for r in centroids.collect()}
    for r in vectors.filter("vec_id >= 400").collect():
        dists = {c: sum((x - y) ** 2 for x, y in zip(r.qv, cv))
                 for c, cv in cents.items()}
        best = min(dists, key=lambda c: (dists[c], c))
        assert r.cell == best, r.vec_id

    # nprobe=k serve over the persisted index == brute top-5 over the
    # UNION corpus (computed independently, no index)
    got = sorted(
        (r.query_id, r.rank, r.neighbor_id, repr(r.cosine))
        for r in ivf_persisted_topk(spark, idx, n_queries=8,
                                    nprobe=k, topn=5).collect())
    rows = {r.vec_id: r.qv for r in base.collect()}

    def cosine(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return float(dot) / (na * nb)

    want = []
    for q in range(8):
        scored = sorted(
            ((-cosine(rows[q], qv), c) for c, qv in rows.items()
             if c != q))
        for rank, (negc, c) in enumerate(scored[:5], 1):
            want.append((q, rank, c, repr(-negc)))
    assert got == sorted(want)
