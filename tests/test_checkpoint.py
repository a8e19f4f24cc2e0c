"""Checkpoint/lineage/resume: compute-once, per-partition lineage, chunk resume."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from tree_sitter_codeviews_spark.checkpoint import Pipeline


def _mk(spark, tmp_path, job="j1"):
    return Pipeline(spark, str(tmp_path), job)


def test_stage_computes_once_and_resumes(spark, tmp_path):
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))

    p1 = _mk(spark, tmp_path)
    out1 = p1.stage("s1", compute)
    assert out1.count() == 100
    assert calls["n"] == 1
    assert p1.recomputed == ["s1"]

    # fresh pipeline object, same root/job -> full resume, zero recompute
    p2 = _mk(spark, tmp_path)
    out2 = p2.stage("s1", compute)
    assert calls["n"] == 1
    assert p2.recomputed == []
    assert sorted(r["v"] for r in out2.collect()) == sorted(
        r["v"] for r in out1.collect()
    )


def test_lineage_rows_cover_every_file_and_sum_to_total(spark, tmp_path):
    p = _mk(spark, tmp_path)
    p.stage("s1", lambda: spark.range(1000).repartition(4))
    lin = p.lineage().collect()
    assert {r["stage"] for r in lin} == {"s1"}
    assert sum(r["n_rows"] for r in lin) == 1000
    assert len({r["file"] for r in lin}) >= 2  # per-partition granularity
    met = p.metrics().collect()
    assert len(met) == 1 and met[0]["n_rows"] == 1000 and met[0]["wall_s"] > 0


def test_chunked_stage_resumes_only_pending_chunks(spark, tmp_path):
    calls: list[str] = []

    def compute_chunk(c: str):
        calls.append(c)
        lo = int(c) * 100
        return spark.range(lo, lo + 100).select(F.col("id"))

    chunks = ["0", "1", "2"]
    p1 = _mk(spark, tmp_path)
    out = p1.chunked_stage("cs", chunks, compute_chunk)
    assert out.count() == 300
    assert calls == chunks

    # wipe one chunk -> only it is pending on resume
    shutil.rmtree(os.path.join(str(tmp_path), "j1", "stages", "cs", "chunk=1"))
    p2 = _mk(spark, tmp_path)
    out2 = p2.chunked_stage("cs", chunks, compute_chunk)
    assert calls == chunks + ["1"]
    assert p2.recomputed == ["cs/1"]
    assert out2.count() == 300
    assert sorted(r["id"] for r in out2.collect()) == list(range(300))


def test_pipeline_job_end_to_end_and_resume(spark, tmp_path, sf_tiny):
    """The spark-submit entry point, driven in-process: full run then a
    resume run that recomputes nothing and returns identical counts."""
    import jobs.run_pipeline as rp

    argv = ["--sf-dir", sf_tiny, "--checkpoint-root", str(tmp_path), "--job-id", "e2e"]
    rp.main(argv, spark=spark)

    p = Pipeline(spark, str(tmp_path), "e2e")
    stages = {r["stage"] for r in p.lineage().select("stage").distinct().collect()}
    assert stages == {"pages", "entities", "triples", "tiles", "dedup_groups",
                      "emb_dedup_groups", "train_set"}

    # resume: no stage dirs are recomputed (metrics row count unchanged)
    n_metrics_before = p.metrics().count()
    rp.main(argv, spark=spark)
    assert Pipeline(spark, str(tmp_path), "e2e").metrics().count() == n_metrics_before
