"""SQL surface: temp views + ``spark.sql`` query entry points.

The engine's operators are DataFrame-first (Catalyst sees the same logical
plan either way), but a user of the reference drives everything through a
declarative config (SURVEY Appendix B); the engine's equivalent declarative
surface is plain Spark SQL over registered views. ``register_views`` exposes
the core tables; the ``sql_*`` queries prove the SQL path produces
bit-identical results to the DataFrame path (same DuckDB oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import layers
from .sources import pages as pages_src


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the engine's core tables as temp views for spark.sql use."""
    from .sources.testdata import load_table

    for t in ("documents", "events", "orders", "customer", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    pages_src.doc_points_df(spark, sf_dir).createOrReplaceTempView("doc_points")
    pages_src.gazetteer_df(spark).createOrReplaceTempView("gazetteer")


def sql_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geo_tiles via pure Spark SQL (same oracle as the DataFrame path):
    multi-res per-tile doc counts by Morton interleave, UNION ALL per level."""
    from . import cells

    register_views(spark, sf_dir)
    parts = []
    for r in range(7, 11):
        shift = layers.GRID_RES - r
        gx = f"(gx >> {shift})" if shift else "gx"
        gy = f"(gy >> {shift})" if shift else "gy"
        parts.append(
            f"SELECT {r} AS res, {cells.morton_sql(gx, gy, r)} AS cell_id, "
            f"count(*) AS n_docs FROM doc_points GROUP BY 1, 2"
        )
    return spark.sql(" UNION ALL ".join(parts))
