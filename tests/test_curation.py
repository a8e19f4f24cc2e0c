"""Curation operators: decontamination, sequence packing, PII scrubbing.

Oracle equality is covered by the gate mirror (test_entry_gate); these pin
the operator-level contracts — scale shapes and invariances.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tree_sitter_codeviews_spark.operators import curation
from tree_sitter_codeviews_spark.queries import _docs, text_pii_scrub


def test_decontaminate_excludes_benchmark_and_flags_overlap(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    out = curation.decontaminate(docs, n=4)
    # benchmark docs never appear in the output
    assert out.filter(F.col("doc_id") % 50 == 7).count() == 0
    # the planted near-dup structure makes some train docs overlap
    assert out.filter("contaminated").count() > 0
    # every doc outside the benchmark slice gets a row (keep-list semantics)
    assert out.count() == docs.filter(F.col("doc_id") % 50 != 7).count()


def test_pack_sequences_is_partitioning_invariant(spark, sf_tiny):
    """bin assignment must be a pure function of the doc_id order — the
    same result at any parallelism (the retry/cluster-resize contract)."""
    docs = _docs(spark, sf_tiny)
    a = curation.pack_sequences(docs, budget=512).collect()
    b = curation.pack_sequences(docs.repartition(37), budget=512).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_sequences_matches_serial_prefix_sum(spark, sf_tiny):
    docs = _docs(spark, sf_tiny)
    rows = curation.pack_sequences(docs, budget=512).collect()
    got = {r["doc_id"]: (r["bin_id"], r["offset_in_bin"]) for r in rows}
    serial = sorted((r["doc_id"], r["n_tokens"]) for r in rows)
    cum = 0
    for doc_id, n in serial:
        assert got[doc_id] == (cum // 512, cum % 512), doc_id
        cum += n


def test_pack_sequences_plan_has_no_single_partition_exchange(spark, sf_tiny):
    """The whole point vs ``Window.orderBy`` packing: no stage funnels the
    corpus through one partition."""
    out = curation.pack_sequences(_docs(spark, sf_tiny), budget=512)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pii_scrub_redacts_planted_pii(spark, sf_tiny):
    out = text_pii_scrub(spark, sf_tiny)
    rows = out.collect()
    for r in rows:
        m = r["doc_id"] % 4
        assert r["n_emails"] == (1 if m == 0 else 0), r
        assert r["n_long_digits"] == (1 if m in (1, 2) else 0), r


def test_pii_scrub_hash_tracks_redaction(spark, sf_tiny):
    """Docs whose injected text contained PII must hash differently from
    the raw injected text (the scrub actually rewrote something)."""
    docs = _docs(spark, sf_tiny).withColumn(
        "text", F.concat(F.col("text"), F.lit(" mail me at a@b.io"))
    )
    out = curation.pii_scrub(docs).join(
        docs.select("doc_id", F.md5("text").alias("raw_hash")), "doc_id"
    )
    assert out.filter(F.col("clean_hash") == F.col("raw_hash")).count() == 0
    assert out.filter(F.col("n_emails") != 1).count() == 0


def test_strip_boilerplate_removes_frequent_segments_only(spark, sf_tiny):
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_tiny)
    out = curation.strip_boilerplate(docs, seg_len=8, max_docs=2)
    assert out.count() == docs.count()          # every doc keeps a row
    assert out.filter("n_kept < n_segs").count() > 0   # something stripped
    assert out.filter("n_kept > n_segs").count() == 0  # never invents segs
    # with the cut disabled (max_docs >= corpus size) nothing is stripped
    # and the reassembly round-trips the original text hash exactly
    intact = curation.strip_boilerplate(docs, seg_len=8, max_docs=10**9)
    joined = intact.join(docs.select("doc_id", F.md5("text").alias("h")), "doc_id")
    assert joined.filter(F.col("clean_hash") != F.col("h")).count() == 0
