"""Smoke the scaling-evidence jobs (the harness the driver runs) at tiny
replication — catches drift between the bench harness and the operators."""

from __future__ import annotations

import bench_scaling


def test_geo_scaling_job_runs(spark, sf_tiny):
    out = bench_scaling.scaling_job(spark, sf_tiny, repl=2, n_parts=4)
    assert out["pages"] == 1000
    assert out["triples"] > 0 and out["tiles"] > 0


def test_dedup_scaling_job_runs(spark, sf_tiny):
    out = bench_scaling.dedup_scaling_job(spark, sf_tiny, repl=2, n_parts=4)
    assert out["pages"] == 1000
    assert out["buckets"] > 0


def test_scale2_cache_key_tracks_base_and_repl(sf_tiny):
    """The replicated-dir marker must identify (base corpus, repl factor):
    a changed SPARK_GRAFT_SF_DIR or REPL2 regenerates instead of silently
    reusing stale tables (r3 advisory)."""
    import os

    import bench

    k1 = bench._scale2_cache_key(sf_tiny, 10)
    assert k1 == bench._scale2_cache_key(sf_tiny, 10)  # deterministic
    assert k1 != bench._scale2_cache_key(sf_tiny, 5)   # repl in the key
    other = os.path.dirname(sf_tiny.rstrip("/"))        # different path
    # different base dir -> different key (other/sf0.01 exists in testdata)
    k_other = bench._scale2_cache_key(os.path.join(other, "sf0.01"), 10)
    assert k1 != k_other
