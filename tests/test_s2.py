"""S2-style Hilbert index: curve properties + Spark-vs-DuckDB parity."""

from __future__ import annotations

import numpy as np

from tree_sitter_codeviews_spark import s2
from tree_sitter_codeviews_spark.queries import geo_s2_encode
from tree_sitter_codeviews_spark.oracle import s2_encode_sql

from oracle_util import assert_matches


def test_hilbert_bijective_small_grid():
    res = 4
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = s2.hilbert_np(xs.ravel(), ys.ravel(), res)
    assert sorted(d.tolist()) == list(range(n * n))


def test_hilbert_consecutive_ids_are_adjacent():
    """The defining Hilbert property (and why it beats Morton as a range-
    partitioning key): successive ids are unit grid steps."""
    res = 5
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    x = xs.ravel()
    y = ys.ravel()
    d = s2.hilbert_np(x, y, res)
    order = np.argsort(d)
    dx = np.abs(np.diff(x[order]))
    dy = np.abs(np.diff(y[order]))
    assert ((dx + dy) == 1).all()


def test_hilbert_parent_is_truncation():
    """Self-similarity: encode at res-1 of the truncated coords == id >> 2."""
    rng = np.random.default_rng(7)
    for res in (8, 12, 16):
        x = rng.integers(0, 1 << res, size=500)
        y = rng.integers(0, 1 << res, size=500)
        fine = s2.hilbert_np(x, y, res)
        coarse = s2.hilbert_np(x >> 1, y >> 1, res - 1)
        np.testing.assert_array_equal(fine >> 2, coarse)


def test_upscale_center_consistent():
    g = np.array([0, 1, 1023])
    up = s2.upscale_grid_np(g, 10, 16)
    np.testing.assert_array_equal(up, g * 64 + 32)


def test_s2_encode_matches_oracle(spark, sf_tiny):
    assert_matches(geo_s2_encode(spark, sf_tiny), sf_tiny, s2_encode_sql(), "geo_s2_encode")


def test_hilbert_coarse_col_matches_numpy_and_truncation(spark):
    """The route-key encode: hilbert_coarse_col == hilbert_np at the coarse
    res, and (self-similarity) == the level-16 branchless encode of the
    upscaled center coords truncated back down."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    res = 2
    n = 1 << res
    pdf = pd.DataFrame({
        "x": rng.integers(0, n, size=200), "y": rng.integers(0, n, size=200)
    })
    df = spark.createDataFrame(pdf)
    got = (
        df.withColumn("d", s2.hilbert_coarse_col(F.col("x"), F.col("y"), res))
        .orderBy("x", "y").select("x", "y", "d").toPandas()
    )
    want = s2.hilbert_np(
        got["x"].to_numpy(), got["y"].to_numpy(), res
    )
    np.testing.assert_array_equal(got["d"].to_numpy(), want)

    up = df.withColumns({
        "x16": s2.upscale_grid_col(F.col("x").cast("long"), res, s2.S2_RES),
        "y16": s2.upscale_grid_col(F.col("y").cast("long"), res, s2.S2_RES),
    })
    up = s2.with_hilbert_col(up, "x16", "y16", s2.S2_RES, out="h16")
    trunc = (
        up.withColumn("d2", s2.hilbert_at_level_col(F.col("h16"), res))
        .orderBy("x", "y").select("d2").toPandas()["d2"].to_numpy()
    )
    np.testing.assert_array_equal(trunc, want)
