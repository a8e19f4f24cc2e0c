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


def sql_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_exact via pure Spark SQL — the declarative twin of the
    DataFrame path (same oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT md5(text) AS text_hash, count(*) AS n_dups, "
        "min(doc_id) AS keep_doc_id FROM documents GROUP BY 1"
    )


def sql_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCH SQL twin of the STREAMING ``events_stream_windows`` query:
    identical hour-window aggregate through ``spark.sql``, same oracle —
    proving drained-stream ≡ batch ≡ declarative SQL on bounded input."""
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT CAST(date_trunc('HOUR', ts) AS timestamp_ntz) AS window_start, "
        "event_type, count(*) AS n_events, "
        "sum(CAST(round(value * 1e6) AS BIGINT)) AS sum_value_micro "
        "FROM events GROUP BY 1, 2"
    )
