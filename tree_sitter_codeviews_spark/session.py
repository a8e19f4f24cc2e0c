"""SparkSession factory tuned for the sandbox (local[N]) but shaped for clusters.

All knobs here are standard public Spark configs. On a real cluster the same
builder is used via ``spark-submit --py-files``; only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tree_sitter_codeviews_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to max(cores, 32) — sized so a shuffle
    partition at bench scale stays well under executor memory; AQE
    coalesces small ones back down at runtime.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # -Xms pins the initial heap: incremental heap growth under load
        # causes full-GC storms with multi-x wall-clock variance in local
        # mode. -XX:-DontCompileHugeMethods lets HotSpot JIT whole-stage-
        # codegen methods past the 8KB bytecode default; without it, wide
        # generated predicates (e.g. the unrolled ray-cast refine) silently
        # run in the bytecode interpreter (measured 24x slower).
        .config("spark.driver.extraJavaOptions",
                f"-Xms{os.environ.get('SPARK_GRAFT_DRIVER_MEM', '16g')} "
                "-XX:-DontCompileHugeMethods")
        .config("spark.executor.extraJavaOptions", "-XX:-DontCompileHugeMethods")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", str(ui).lower())
        # deterministic float formatting / parquet behavior
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Fully stop any active session (needed to rebuild at a new core count)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # clear cached builder state so a new master takes effect
    SparkSession.builder._options = {}
