"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship pipeline smoke at sf0.001.
queries()         — name -> (spark, sf_dir) -> DataFrame, one per operator.
oracle_sql()      — name -> equivalent DuckDB SQL over the same parquet views.

Implementations live in ``tree_sitter_codeviews_spark`` (queries.py /
oracle.py); this module is a thin registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tree_sitter_codeviews_spark import oracle, queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages -> byte-identical extract -> entities -> cell encode ->
    two-phase PIP join -> (url, cell_id, polygon_id) triples."""
    return q.geo_pip_entities(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "geo_cell_encode": q.geo_cell_encode,
        "geo_pip_docs": q.geo_pip_docs,
        "geo_pip_best": q.geo_pip_best,
        "geo_entities": q.geo_entities,
        "geo_pip_entities": q.geo_pip_entities,
        "geo_tiles": q.geo_tiles,
        "geo_knn": q.geo_knn,
        "geo_extract_text": q.geo_extract_text,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "geo_cell_encode": oracle.cell_encode_sql(),
        "geo_pip_docs": oracle.pip_docs_sql(),
        "geo_pip_best": oracle.pip_best_sql(),
        "geo_entities": oracle.entities_sql(),
        "geo_pip_entities": oracle.pip_entities_sql(),
        "geo_tiles": oracle.tiles_sql(),
        "geo_knn": oracle.knn_sql(),
        "geo_extract_text": oracle.extract_text_sql(),
    }
