"""IVF ANN invariants (functions/similarity.py ivf_*)."""

from __future__ import annotations

from pyspark.sql import functions as F

import opendataloader_pdf_spark.functions.similarity as S


def _emb(spark, sf_dir):
    from opendataloader_pdf_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def test_ivf_assign_partitions_corpus(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cent = S.ivf_centroids(emb, "vec_id", "embedding", n_cells=8)
    assert cent.count() == 8
    ca = S.ivf_assign(emb, "vec_id", "embedding", cent)
    assert ca.count() == emb.count()  # every vector in exactly one cell
    cells = {r.cell for r in ca.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, q, "vec_id", "embedding", "vec_id", k=5)
    approx = S.ivf_topk(emb, q, "vec_id", "embedding", "vec_id", k=5,
                        n_cells=8, nprobe=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # deterministic on the fixed testdata (measured 0.77); random
    # embeddings are IVF's worst case, so the bar is conservative
    assert len(e & a) / len(e) >= 0.7
    # every reported cosine is the true cosine (approximation is only in
    # candidate pruning, never in scores)
    joined = approx.alias("x").join(
        S.brute_force_topk(emb, q, "vec_id", "embedding", "vec_id", k=500)
        .alias("t"),
        ["query_id", "neighbor_id"],
    ).filter(F.col("x.cosine") != F.col("t.cosine"))
    assert joined.count() == 0


def test_kmeans_refinement_recovers_clusters(spark):
    """On a corpus of 4 well-separated clusters, spherical k-means
    refinement of the sampled codebook yields near-pure cells and
    nprobe=1 search with high recall."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = np.eye(4, 16) * 10.0  # 4 orthogonal, far-apart centers
    rows = []
    for i in range(400):
        c = i % 4
        v = centers[c] + rng.randn(16) * 0.1
        rows.append((i, [float(x) for x in v], c))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, truth int")

    cent0 = S._centroid_matrix(
        S.ivf_centroids(df, "vec_id", "embedding", n_cells=4)
    )
    cent1 = S.ivf_refine(df, "embedding", cent0, iters=3)

    def purity(C):
        probe = S._cell_probe_udf(C, 1)
        a = df.withColumn("cell", F.element_at(probe("embedding"), 1)).toPandas()
        # a cell is "pure" if all its members share one truth label
        tot = 0
        for _, g in a.groupby("cell"):
            tot += g["truth"].value_counts().iloc[0]
        return tot / len(a)

    p0, p1 = purity(cent0), purity(cent1)
    assert p1 >= p0
    assert p1 >= 0.99  # Lloyd rounds on separated clusters converge

    q = df.filter(F.col("vec_id") < 8)
    exact = S.brute_force_topk(df, q, "vec_id", "embedding", "vec_id", k=5)
    approx = S.ivf_topk(df, q, "vec_id", "embedding", "vec_id", k=5,
                        n_cells=4, nprobe=1, refine_iters=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.95
