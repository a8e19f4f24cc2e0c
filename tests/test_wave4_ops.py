"""Unit properties for the r4 wave-4 operators: LPA communities, BPE
application, shingle novelty, exact length quantiles — beyond the oracle
equality the gate mirror asserts."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tree_sitter_codeviews_spark.operators import bpe, dedup, linkgraph, textstats
from tree_sitter_codeviews_spark.sources.testdata import load_table


def test_label_propagation_converges_on_two_cliques(spark):
    """Two disjoint triangles end up with exactly one label each, and the
    label is the smallest md5 label inside the triangle (deterministic
    tie-break)."""
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")],
        "src string, dst string",
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",), ("z",)], "host string"
    )
    got = {
        r["host"]: r["community"]
        for r in linkgraph.label_propagation(edges, nodes, iterations=4).collect()
    }
    assert len({got["a"], got["b"], got["c"]}) == 1
    assert len({got["x"], got["y"], got["z"]}) == 1
    assert got["a"] != got["x"]


def test_label_propagation_isolated_node_keeps_label(spark):
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("b",), ("lone",)], "host string")
    res = linkgraph.label_propagation(edges, nodes, iterations=2)
    lone = res.filter(F.col("host") == "lone").first()
    init = int(
        nodes.select(
            F.conv(F.substring(F.md5(F.col("host")), 1, 7), 16, 10).cast("long")
        ).where(F.col("host") == "lone").first()[0]
    )
    assert lone["community"] == init


def test_bpe_apply_matches_python_reference(spark, sf_tiny):
    """Re-apply the learned rules to every word in a doc with plain Python
    string replaces and recount symbols — must equal the engine's stats."""
    docs = load_table(spark, sf_tiny, "documents")
    rules = [
        (r["sym_a"], r["sym_b"])
        for r in bpe.bpe_train(docs, merges=8).orderBy("merge_rank").collect()
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe.bpe_apply(docs, merges=8).collect()
    }
    for row in docs.orderBy("doc_id").limit(25).collect():
        words = row["text"].split(" ")
        n_tokens = 0
        for wd in words:
            enc = "".join(f"({ch})" for ch in wd)
            for a, b in rules:
                enc = enc.replace(f"({a})({b})", f"({a}{b})")
            n_tokens += enc.count("(")
        want = (len(words), n_tokens, sum(len(wd) for wd in words))
        assert got[row["doc_id"]] == want
    # merges actually compress: strictly fewer tokens than characters
    assert all(t < c for (_, t, c) in got.values())


def test_novelty_bounds_and_first_doc_fully_novel(spark, sf_tiny):
    docs = load_table(spark, sf_tiny, "documents")
    res = dedup.novelty_stats(docs, n=3)
    rows = res.collect()
    assert all(0 <= r["n_novel"] <= r["n_shingles"] for r in rows)
    assert all(0 <= r["novelty_ppm"] <= 1_000_000 for r in rows)
    first_doc = docs.agg(F.min("doc_id")).first()[0]
    first = next(r for r in rows if r["doc_id"] == first_doc)
    assert first.n_novel == first.n_shingles  # nothing precedes doc 0


def test_length_quantiles_match_pandas(spark, sf_tiny):
    docs = load_table(spark, sf_tiny, "documents")
    got = {
        r["source"]: (r["n_docs"], r["p50_chars"], r["p90_chars"], r["p99_chars"])
        for r in textstats.length_quantiles(docs).collect()
    }
    pdf = docs.select("source", "n_chars", "doc_id").toPandas()
    for src, g in pdf.groupby("source"):
        vals = g.sort_values(["n_chars", "doc_id"])["n_chars"].tolist()
        n = len(vals)
        want = (
            n,
            vals[-(-50 * n // 100) - 1],
            vals[-(-90 * n // 100) - 1],
            vals[-(-99 * n // 100) - 1],
        )
        assert got[src] == want


# --- wave 6: funnel / retention ------------------------------------------------

def test_funnel_stages_match_pandas_recompute(spark, sf_tiny):
    from tree_sitter_codeviews_spark.operators import relational

    got = {
        r["user_id"]: r["stage"]
        for r in relational.events_funnel(spark, sf_tiny).collect()
    }
    ev = load_table(spark, sf_tiny, "events").select(
        "user_id", "event_type", "ts"
    ).toPandas()
    for uid, g in ev.groupby("user_id"):
        stage = 0
        tv = g.loc[g.event_type == "view", "ts"].min()
        if pd.notna(tv):
            stage = 1
            tc = g.loc[(g.event_type == "click") & (g.ts > tv), "ts"].min()
            if pd.notna(tc):
                stage = 2
                tp = g.loc[(g.event_type == "purchase") & (g.ts > tc), "ts"].min()
                if pd.notna(tp):
                    stage = 3
        assert got[uid] == stage
    assert max(got.values()) >= 1  # funnel is non-vacuous


def test_retention_day_zero_covers_every_user(spark, sf_tiny):
    """Each cohort's offset-0 cell counts exactly its members (every user
    is active on their own first day), and offsets are non-negative."""
    from tree_sitter_codeviews_spark.operators import relational

    rows = relational.events_retention(spark, sf_tiny).collect()
    assert all(r["offset_days"] >= 0 for r in rows)
    day0 = {r["cohort_day"]: r["n_users"] for r in rows if r["offset_days"] == 0}
    n_users = load_table(spark, sf_tiny, "events").select("user_id").distinct().count()
    assert sum(day0.values()) == n_users
