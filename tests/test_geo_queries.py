"""End-to-end gate mirror: every geo query vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from tree_sitter_codeviews_spark import oracle, queries
from tests.oracle_util import assert_matches

CASES = [
    ("geo_cell_encode", queries.geo_cell_encode, oracle.cell_encode_sql()),
    ("geo_pip_docs", queries.geo_pip_docs, oracle.pip_docs_sql()),
    ("geo_pip_best", queries.geo_pip_best, oracle.pip_best_sql()),
    ("geo_entities", queries.geo_entities, oracle.entities_sql()),
    ("geo_pip_entities", queries.geo_pip_entities, oracle.pip_entities_sql()),
    ("geo_tiles", queries.geo_tiles, oracle.tiles_sql()),
    ("geo_knn", queries.geo_knn, oracle.knn_sql()),
    ("geo_extract_text", queries.geo_extract_text, oracle.extract_text_sql()),
]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_geo_query_vs_oracle(spark, sf_tiny, name, fn, sql):
    assert_matches(fn(spark, sf_tiny), sf_tiny, sql, name)


def test_extraction_deterministic(spark, sf_tiny):
    """Byte-identity across reruns and partition counts (the core invariant)."""
    a = queries.geo_extract_text(spark, sf_tiny).toPandas().set_index("url")["text_out"]
    b = (
        queries.geo_extract_text(spark, sf_tiny)
        .repartition(13)
        .toPandas()
        .set_index("url")["text_out"]
    )
    assert a.sort_index().equals(b.sort_index())


def test_uncovered_plus_covered_partitions_docs(spark):
    """Coverage-gap audit + PIP hits partition the corpus: every doc is
    either inside >= 1 polygon or counted in exactly one uncovered tile."""
    import duckdb
    from pyspark.sql import functions as F

    from tree_sitter_codeviews_spark import queries as q

    sf = "/root/testdata/sf0.001"
    uncovered = (
        q.geo_uncovered_docs(spark, sf).agg(F.sum("n_docs").alias("s")).collect()[0]["s"]
    )
    covered = q.geo_pip_docs(spark, sf).select("doc_id").distinct().count()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/documents.parquet')"
    ).fetchone()[0]
    assert uncovered + covered == total
    assert uncovered > 0 and covered > 0
