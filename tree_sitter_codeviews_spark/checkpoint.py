"""Stage checkpointing: per-partition lineage + metrics, resume-without-recompute.

Design recorded in SURVEY.md §2.9/§7.2-stage-5: the reference re-parses every
document once per view (``AST_driver.py:17``, ``CFG_driver.py:17``,
``DFG_driver.py:17`` — its biggest wasted-work bug); the engine inverts that
into *compute once, checkpoint, reuse*. Resume is **batch** idempotence, not
Structured Streaming: each stage writes to a stage table; a completed stage
(atomic ``_SUCCESS`` marker, written by Spark's commit protocol) is read
back, never recomputed; a chunked stage recomputes only its pending chunks
(the anti-join of declared chunks minus committed ones).

In the sandbox the checkpoint "table" is a parquet directory tree; on a real
cluster the same layout maps 1:1 onto an Iceberg table partitioned by
(job_id, stage) — ``append`` here == ``writeTo(...).append()`` there, and
the ``_SUCCESS`` marker's role is played by the snapshot commit.

Layout:
    {root}/{job_id}/stages/{stage}/            stage output parquet
    {root}/{job_id}/stages/{stage}/chunk={c}/  chunked stage output
    {root}/{job_id}/lineage/                   (stage, chunk, file, n_rows, ...)
    {root}/{job_id}/metrics/                   (stage, n_rows, n_files, wall_s, ...)

Lineage is harvested from the *written* files (one metadata-cheap scan of the
fresh output grouped by ``input_file_name``), never by re-running the stage
plan — the written bytes are the ground truth a resume will read.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


class Pipeline:
    """A resumable multi-stage job. Same (root, job_id) => same checkpoints."""

    def __init__(self, spark: SparkSession, root: str, job_id: str):
        self.spark = spark
        self.root = root
        self.job_id = job_id
        self.base = os.path.join(root, job_id)
        self.recomputed: list[str] = []  # stage/chunk names computed this run

    # -- internal ----------------------------------------------------------

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.base, "stages", stage)

    def _append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(os.path.join(self.base, table))

    def _record(self, stage: str, chunk: str, out_dir: str, wall_s: float) -> None:
        written = self.spark.read.parquet(out_dir)
        lineage = (
            written.groupBy(F.input_file_name().alias("file"))
            .agg(F.count("*").alias("n_rows"))
            .select(
                F.lit(self.job_id).alias("job_id"),
                F.lit(stage).alias("stage"),
                F.lit(chunk).alias("chunk"),
                "file",
                "n_rows",
            )
        )
        self._append("lineage", lineage)
        m = written.agg(F.count("*").alias("n_rows")).collect()[0]
        metrics = self.spark.createDataFrame(
            [(self.job_id, stage, chunk, int(m["n_rows"]), float(wall_s), time.time())],
            "job_id string, stage string, chunk string, n_rows long, wall_s double, recorded_at double",
        )
        self._append("metrics", metrics)

    # -- public ------------------------------------------------------------

    def stage(self, name: str, compute: Callable[[], DataFrame]) -> DataFrame:
        """Run (or resume) one stage; returns the stage output DataFrame
        backed by the checkpoint files (lineage truncated — downstream
        stages re-read parquet, they don't re-trace the producing plan)."""
        out = self._stage_dir(name)
        if not _complete(out):
            t0 = time.monotonic()
            compute().write.mode("overwrite").parquet(out)
            self._record(name, "", out, time.monotonic() - t0)
            self.recomputed.append(name)
        return self.spark.read.parquet(out)

    def chunked_stage(
        self,
        name: str,
        chunks: Sequence[str],
        compute_chunk: Callable[[str], DataFrame],
    ) -> DataFrame:
        """Stage split into independently-committed chunks (e.g. Hilbert
        key ranges). Resume recomputes only pending chunks."""
        base = self._stage_dir(name)
        pending = [c for c in chunks if not _complete(os.path.join(base, f"chunk={c}"))]
        for c in pending:
            out = os.path.join(base, f"chunk={c}")
            t0 = time.monotonic()
            compute_chunk(c).write.mode("overwrite").parquet(out)
            self._record(name, c, out, time.monotonic() - t0)
            self.recomputed.append(f"{name}/{c}")
        return self.spark.read.option("basePath", base).parquet(
            *[os.path.join(base, f"chunk={c}") for c in chunks]
        )

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.base, "lineage"))

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.base, "metrics"))
