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
