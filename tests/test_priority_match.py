"""Priority-match join (template specialization / exception matching) and
the preprocessor guard evaluator.

The gate mirror (test_entry_gate) already proves oracle equality for the
three queries; these tests pin the operator semantics directly on tiny
hand-built inputs, plus non-vacuity of every resolution path at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_codeviews_spark.operators import cascade, extract
from tree_sitter_codeviews_spark.queries import (
    geo_preproc_filter,
    geo_template_resolve,
    graph_catch_match,
)


def test_priority_match_join_first_level_wins_and_default(spark):
    big = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "zz")], "id long, key string"
    )
    d1 = spark.createDataFrame([("a", 10)], "k1 string, matched long")
    # level 2 matches 'a' AND 'b', with two candidates for 'b' (min wins)
    d2 = spark.createDataFrame(
        [("a", 99), ("b", 21), ("b", 20)], "k2 string, matched long"
    )
    out = cascade.priority_match_join(
        big,
        keys=["id"],
        levels=[
            ("exact", d1, big["key"] == d1["k1"], d1["matched"]),
            ("fuzzy", d2, big["key"] == d2["k2"], d2["matched"]),
        ],
        out_col="matched",
        default=F.lit(-1).cast("long"),
    )
    rows = {r["id"]: (r["matched"], r["via"]) for r in out.collect()}
    assert rows[1] == (10, "exact")   # level 1 beats level 2's 99
    assert rows[2] == (20, "fuzzy")   # within-level min candidate wins
    assert rows[3] == (-1, "none")    # unmatched -> default
    assert out.count() == 3           # no fan-out from multi-candidate dims


def test_preproc_evaluator_truth_table(spark):
    cfg = {"A": True, "B": False}
    cases = [
        ("A", True), ("!A", False), ("B", False), ("!B", True),
        ("A&&B", False), ("A&&!B", True), ("A||B", True), ("B||!A", False),
        ("A&&B||!B", True), ("B&&B||B&&A", False),
    ]
    df = spark.createDataFrame([(g,) for g, _ in cases], "guard string")
    got = {
        r["guard"]: r["active"]
        for r in df.withColumn(
            "active", extract.preproc_active_col(F.col("guard"), cfg)
        ).collect()
    }
    for guard, want in cases:
        assert got[guard] == want, guard


def test_template_resolve_every_tier_is_reachable(spark, sf_tiny):
    vias = {
        r["via"]
        for r in geo_template_resolve(spark, sf_tiny).select("via").distinct().collect()
    }
    assert vias == {"exact", "prefix7", "suffix2", "primary"}


def test_catch_match_has_matches_and_escapes(spark, sf_tiny):
    out = graph_catch_match(spark, sf_tiny)
    agg = out.agg(
        F.sum((F.col("catch_prio") >= 0).cast("int")).alias("matched"),
        F.sum((F.col("catch_prio") == -1).cast("int")).alias("escaped"),
    ).collect()[0]
    assert agg["matched"] > 0 and agg["escaped"] > 0
    # a matched row's catch class must be ancestor-or-self of the thrown
    # class: ancestors of x in the binary tree are x, (x-1)//2, ...
    for r in out.filter(F.col("catch_prio") >= 0).limit(20).collect():
        x, anc = r["thrown_class"], set()
        while True:
            anc.add(x)
            if x == 0:
                break
            x = (x - 1) // 2
        assert r["catch_class"] in anc


def test_preproc_filter_half_the_docs_survive(spark, sf_tiny):
    out = geo_preproc_filter(spark, sf_tiny)
    n = out.count()
    kept = out.filter("active").count()
    # guards 0,3,4 of the 6-cycle are active -> ~half the docs
    assert 0.4 < kept / n < 0.6


def test_priority_match_join_rejects_out_col_collision(spark):
    """The probe table owning a column named out_col would make the dim
    value reference ambiguous (or silently bind to the probe side) — the
    operator must refuse instead (r3 advisory)."""
    import pytest

    big = spark.createDataFrame([(1, "a", 0)], "id long, key string, matched long")
    dim = spark.createDataFrame([("a", 10)], "k string, matched long")
    with pytest.raises(ValueError, match="already has a column"):
        cascade.priority_match_join(
            big, keys=["id"],
            levels=[("only", dim, big["key"] == dim["k"], dim["matched"])],
            out_col="matched",
        )


def test_priority_match_join_rejects_missing_dim_value_col(spark):
    import pytest

    big = spark.createDataFrame([(1, "a")], "id long, key string")
    dim = spark.createDataFrame([("a", 10)], "k string, other long")
    with pytest.raises(ValueError, match="lacks the value column"):
        cascade.priority_match_join(
            big, keys=["id"],
            levels=[("only", dim, big["key"] == dim["k"], dim["other"])],
            out_col="matched",
        )
