"""Skyline / choropleth / fuzzy-link wave: dominance and linking
invariants beyond the DuckDB twin."""

from __future__ import annotations

import itertools

from tree_sitter_codeviews_spark import queries as q

SF = "/root/testdata/sf0.001"


def test_skyline_is_antichain_and_dominates_rest(spark):
    sky = q.geo_tile_skyline(spark, SF).toPandas()
    assert len(sky) > 1
    pts = list(zip(sky["n_pings"], sky["n_users"]))
    # no skyline point dominates another (antichain)
    for a, b in itertools.permutations(pts, 2):
        assert not (a[0] >= b[0] and a[1] >= b[1] and a != b) or (
            a[0] == b[0] and a[1] == b[1]
        )
    # the frontier contains the per-axis maxima
    assert sky["n_pings"].max() in sky["n_pings"].to_numpy()
    assert sky["n_users"].max() == max(
        u for _, u in pts
    )


def test_choropleth_bins_balanced(spark):
    pdf = q.geo_choropleth_bins(spark, SF).toPandas()
    sizes = pdf.groupby("quintile").size()
    assert set(sizes.index) == set(range(1, q.CHORO_BINS + 1))
    # SQL-standard ntile: bucket sizes differ by at most one
    assert sizes.max() - sizes.min() <= 1
    # bins are monotone in the ordering value: every count in bin k is <=
    # every count in bin k+1 (up to the deterministic tie-break, counts at
    # a bin boundary may repeat across bins)
    for k in range(1, q.CHORO_BINS):
        assert pdf[pdf["quintile"] == k]["n_pings"].max() <= (
            pdf[pdf["quintile"] == k + 1]["n_pings"].min()
        ) or pdf[pdf["quintile"] == k]["n_pings"].max() == (
            pdf[pdf["quintile"] == k + 1]["n_pings"].min()
        )


def test_fuzzy_link_recovers_true_entity(spark):
    """Every typo'd mention must link back to (at least) the entity it was
    derived from — single-deletion blocking has perfect recall for
    edit-distance-1 deletions."""
    import duckdb

    from tree_sitter_codeviews_spark import layers

    got = q.text_fuzzy_link(spark, SF).toPandas().set_index("gaz_idx")["n_docs"]
    gi = layers.MENTION_IDX_SQL.format(j="j")
    truth = duckdb.sql(f"""
        WITH m AS (
          SELECT doc_id, unnest(generate_series(0, doc_id % 3)) AS j
          FROM read_parquet('{SF}/documents.parquet')
        )
        SELECT {gi} AS gaz_idx, count(DISTINCT doc_id) AS n_docs
        FROM m GROUP BY 1
    """).df().set_index("gaz_idx")["n_docs"]
    # the true source entity is always among the linked candidates, so the
    # per-entity linked-doc count is bounded below by the true mention count
    for idx, n in truth.items():
        assert got.get(idx, 0) >= n
