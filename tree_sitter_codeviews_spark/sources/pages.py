"""Deterministic Common-Crawl-style pages table (BASELINE.json input_hint).

Synthesised from the driver's ``documents`` parquet with **pure JVM column
expressions** (no Python anywhere): every column is a deterministic function
of ``doc_id`` + ``text``, so the table is byte-identical across reruns,
retries and parallelism levels — the engine-side restatement of the
reference's content-derived-key discipline (``custom_parser.py:45-57``) and
the preprocessor's pure-function contract (``utils/preprocessor.py:6-68``).

Schema: (url string, warc_ts timestamp, html binary, text string, lang string)
plus ``doc_id`` kept as the lineage key back to the source table.

The page body embeds 1-3 gazetteer mentions (`` GEO_#####`` tokens, formulas in
``layers.py``) that the extraction operators later recover from the html —
the whole point being that extraction must reproduce them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import layers
from .testdata import load_table

HTML_PRE = "<html><head><title>"
HTML_MID = "</title></head><body><p>"
HTML_POST = "</p></body></html>"


def _mention_piece(j: int):
    """Column: '' or ' GEO_#####' depending on mentions-per-doc (1 + doc_id%3)."""
    idx = (F.col("doc_id") * 7 + F.lit(j * 131)) % layers.N_GAZ
    piece = F.concat(F.lit(" GEO_"), F.format_string("%05d", idx))
    return F.when(F.lit(j) < 1 + F.col("doc_id") % 3, piece).otherwise(F.lit(""))


def page_text_col():
    """text || embedded mentions — the byte-identical extraction target."""
    return F.concat(F.col("text"), _mention_piece(0), _mention_piece(1), _mention_piece(2))


def url_col():
    return F.format_string("https://host%04d.example/doc/%d",
                           F.col("doc_id") % 100, F.col("doc_id"))


def warc_ts_col():
    # seeded timestamp in a fixed 30-day window (FIXTURES.md §1)
    return F.expr(
        "timestamp'2026-01-01 00:00:00' + make_interval(0,0,0,0,0,0, (doc_id * 97) % 2592000)"
    )


def pages_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the sf parquet is a single row group (= one task); spread the NARROW
    # source columns before synthesizing html so downstream Arrow-UDF
    # extraction parallelizes. Capped at 16: in local mode each extra UDF
    # partition costs a Python worker, and JVM-threads + workers > CPUs
    # thrashes (measured 0.47s at 4-16 parts vs 1.6s at 32 on this suite's
    # data). At production scale the table arrives already partitioned and
    # this shuffle disappears.
    n_parts = max(4, min(16, spark.sparkContext.defaultParallelism))
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang")
        .repartition(n_parts, "doc_id")
    )
    body = page_text_col()
    url = url_col()
    html = F.encode(
        F.concat(F.lit(HTML_PRE), url, F.lit(HTML_MID), body, F.lit(HTML_POST)),
        "UTF-8",
    )
    return docs.select(
        F.col("doc_id"),
        url.alias("url"),
        warc_ts_col().alias("warc_ts"),
        html.alias("html"),
        body.alias("text"),
        F.col("lang"),
    )


def gazetteer_df(spark: SparkSession) -> DataFrame:
    """Broadcast dim: (gaz_idx, surface, lon, lat, entity_kind). Tiny (1000
    rows) — built natively from range(); always broadcast at join sites."""
    g = spark.range(layers.N_GAZ).withColumnRenamed("id", "gaz_idx")
    gx = (F.col("gaz_idx") * 37 + 11) % layers.GRID_N
    gy = (F.col("gaz_idx") * 73 + 29) % layers.GRID_N
    return g.select(
        "gaz_idx",
        F.format_string("GEO_%05d", F.col("gaz_idx")).alias("surface"),
        (F.lit(-180.0) + F.lit(360.0) * (gx.cast("double") + 0.5) / layers.GRID_N).alias("lon"),
        (F.lit(-90.0) + F.lit(180.0) * (gy.cast("double") + 0.5) / layers.GRID_N).alias("lat"),
        F.element_at(
            F.array(F.lit("city"), F.lit("poi"), F.lit("region")),
            (F.col("gaz_idx") % 3 + 1).cast("int"),
        ).alias("entity_kind"),
    )


def doc_points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic point per document (with hot-cell skew), native ops.

    (doc_id, gx, gy, lon, lat) at the res-10 derivation grid (layers.py)."""
    return points_from_ids(load_table(spark, sf_dir, "documents").select("doc_id"))


def points_from_ids(docs: DataFrame) -> DataFrame:
    """Derive deterministic skewed points from any (doc_id) set — same
    formulas as ``layers.doc_grid_xy_np`` / the DuckDB oracle CTEs.

    Built as SQL text (the DOC_GX_SQL constants + D-suffixed double
    literals so nothing parses as DECIMAL): the Column-builder version of
    this projection measured ~0.16 s of py4j driver time per plan build,
    and every geo query builds it. Values identical (hot-cell CASE == the
    element_at lookup, same IEEE op order for lon/lat)."""
    gx = f"cast({layers.DOC_GX_SQL} as bigint)"
    gy = f"cast({layers.DOC_GY_SQL} as bigint)"
    return docs.selectExpr(
        "doc_id",
        f"{gx} as gx",
        f"{gy} as gy",
        f"(-180.0D + 360.0D * (cast({gx} as double) + 0.5D) / 1024) as lon",
        f"(-90.0D + 180.0D * (cast({gy} as double) + 0.5D) / 1024) as lat",
    )
