"""kNN ring on an adversarially sparse corpus (round-1 watch item): queries
in empty regions must resolve through the dynamic ring doubling — with full
grid coverage there is no uncapped brute-force tail — and still match the
exact brute-force answer."""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_codeviews_spark import layers
from tree_sitter_codeviews_spark.operators import knn


def _sparse_points(spark):
    # 12 points hugging the grid corners/edges; vast empty interior
    n = layers.GRID_N
    coords = [
        (0, 0), (1, 0), (0, 1), (2, 3),
        (n - 1, n - 1), (n - 2, n - 1), (n - 1, n - 3), (n - 4, n - 2),
        (0, n - 1), (1, n - 2), (n - 1, 0), (n - 2, 2),
    ]
    rows = [(i, gx, gy) for i, (gx, gy) in enumerate(coords)]
    df = spark.createDataFrame(rows, "doc_id long, gx long, gy long")
    return df.select(
        "doc_id", "gx", "gy",
        (F.lit(-180.0) + F.lit(360.0) * (F.col("gx").cast("double") + 0.5) / n).alias("lon"),
        (F.lit(-90.0) + F.lit(180.0) * (F.col("gy").cast("double") + 0.5) / n).alias("lat"),
    )


def test_knn_ring_sparse_matches_brute(spark):
    pts = _sparse_points(spark)
    got = {
        (r.doc_id, r.rank): (r.neighbor_id, r.dist_sq)
        for r in knn.knn_ring(pts, spark, k=3, res=5).collect()
    }
    want = {
        (r.doc_id, r.rank): (r.neighbor_id, r.dist_sq)
        for r in knn.knn_brute(pts, k=3).collect()
    }
    assert got == want


def test_knn_ring_corpus_smaller_than_k(spark):
    # fewer than k+1 points: every query returns all others, ranks 1..n-1
    pts = _sparse_points(spark).limit(3)
    rows = knn.knn_ring(pts, spark, k=5, res=5).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.doc_id, []).append(r.rank)
    assert set(per_q) == {0, 1, 2}
    assert all(sorted(v) == [1, 2] for v in per_q.values())
