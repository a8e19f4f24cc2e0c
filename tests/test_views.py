"""Graph-view transforms + new relational/tile queries vs oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_codeviews_spark import oracle
from tree_sitter_codeviews_spark.operators import views
from tree_sitter_codeviews_spark.operators.relational import events_sessions
from tree_sitter_codeviews_spark.queries import (
    geo_tiles_approx,
    geo_tiles_distinct,
    graph_collapse,
    graph_minimize,
)

from oracle_util import assert_matches


def test_tiles_distinct_matches_oracle(spark, sf_tiny):
    assert_matches(
        geo_tiles_distinct(spark, sf_tiny), sf_tiny,
        oracle.tiles_distinct_sql(), "geo_tiles_distinct",
    )


def test_tiles_approx_close_to_exact(spark, sf_tiny):
    exact = {r["cell_id"]: r["n_hosts"] for r in geo_tiles_distinct(spark, sf_tiny).collect()}
    approx = {r["cell_id"]: r["n_hosts_approx"] for r in geo_tiles_approx(spark, sf_tiny).collect()}
    assert set(exact) == set(approx)
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(2, 0.1 * n)


def test_graph_collapse_matches_oracle(spark, sf_tiny):
    assert_matches(
        graph_collapse(spark, sf_tiny), sf_tiny, oracle.graph_collapse_sql(), "graph_collapse"
    )


def test_graph_minimize_matches_oracle(spark, sf_tiny):
    assert_matches(
        graph_minimize(spark, sf_tiny), sf_tiny, oracle.graph_minimize_sql(), "graph_minimize"
    )


def test_events_sessions_matches_oracle(spark, sf_tiny):
    assert_matches(
        events_sessions(spark, sf_tiny), sf_tiny,
        oracle.events_sessions_sql(), "events_sessions",
    )


def test_combine_views_unions_shared_id_space(spark):
    n1 = spark.createDataFrame([(0, 1, "a"), (0, 2, "b")], "graph_id int, node_id int, label string")
    n2 = spark.createDataFrame([(0, 2, "b"), (0, 3, "c")], "graph_id int, node_id int, label string")
    e1 = spark.createDataFrame([(0, 1, 2, "ast")], "graph_id int, src int, dst int, edge_type string")
    e2 = spark.createDataFrame([(0, 1, 2, "cfg"), (0, 2, 3, "cfg")], "graph_id int, src int, dst int, edge_type string")
    nodes, edges = views.combine_views([n1, n2], [e1, e2])
    assert nodes.count() == 3  # shared-id dedupe
    # multigraph: same (src,dst) with different edge_type both kept
    assert edges.count() == 3
    assert edges.filter((F.col("src") == 1) & (F.col("dst") == 2)).count() == 2


def test_minimize_bypasses_removed_node(spark):
    n = spark.createDataFrame(
        [(0, 1, "x", "keep"), (0, 2, "y", "drop"), (0, 3, "z", "keep")],
        "graph_id int, node_id int, label string, node_type string",
    )
    e = spark.createDataFrame(
        [(0, 1, 2, "next"), (0, 2, 3, "next")],
        "graph_id int, src int, dst int, edge_type string",
    )
    keep_nodes, new_edges = views.minimize_nodes(n, e, blacklist=["drop"])
    assert sorted(r["node_id"] for r in keep_nodes.collect()) == [1, 3]
    rows = [(r["src"], r["dst"]) for r in new_edges.collect()]
    assert rows == [(1, 3)]


def test_unpivot_round_trips_pivot(spark):
    """melt(pivot(x)) == the tall per-(user, type) counts, and re-pivoting
    the melt reproduces the wide table."""
    from pyspark.sql import functions as F

    from tree_sitter_codeviews_spark import queries as q
    from tree_sitter_codeviews_spark.operators.relational import events_pivot
    from tree_sitter_codeviews_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    tall = q.events_unpivot(spark, sf).toPandas()
    direct = (
        load_table(spark, sf, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    key = ["user_id", "event_type"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        tall.sort_values(key).reset_index(drop=True),
        direct.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )


def test_percent_rank_ppm_bounds(spark):
    from tree_sitter_codeviews_spark import queries as q

    pdf = q.events_percent_rank_ppm(spark, "/root/testdata/sf0.001").toPandas()
    assert pdf["prank_ppm"].between(0, 1_000_000).all()
    # each type's min is 0 and max is 1e6 (n > 1 per type in the fixture)
    g = pdf.groupby("event_type")["prank_ppm"]
    assert (g.min() == 0).all() and (g.max() == 1_000_000).all()
    # equal values share a ppm (rank ties)
    for _, grp in pdf.groupby("event_type"):
        assert grp.groupby("v_micro")["prank_ppm"].nunique().max() == 1
