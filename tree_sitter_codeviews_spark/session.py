"""SparkSession factory tuned for the sandbox (local[N]) but shaped for clusters.

All knobs here are standard public Spark configs. On a real cluster the same
builder is used via ``spark-submit --py-files``; only master/memory change.
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess

from pyspark.sql import SparkSession

_SHIM_CACHE = "/tmp/tscv_fs_shim_classes"


def _fs_shim_classpath() -> str | None:
    """Compile (once, cached on disk) the NIO-chmod local filesystem shim.

    Without the native hadoop library (absent in this sandbox), Hadoop's
    RawLocalFileSystem implements ``setPermission`` by FORKING a ``chmod``
    subprocess per created file/directory. Structured Streaming state
    checkpointing creates O(state partitions x stores) small files per
    micro-batch, partially under the global state-store provider lock —
    profiled at ~25 ms per fork, this serialized to multi-second
    micro-batch floors (thread dumps: every executor thread blocked on
    ``StateStore$.getStateStoreProvider`` while the holder sat in
    ``Shell.runCommand``). The shim overrides ``setPermission`` with
    ``java.nio.file.Files.setPosixFilePermissions`` — the same semantics,
    no fork. On clusters with libhadoop the stock implementation already
    uses native chmod and the shim is unnecessary (set
    ``SPARK_GRAFT_NO_FS_SHIM=1`` to disable it).
    """
    if os.environ.get("SPARK_GRAFT_NO_FS_SHIM") == "1":
        return None
    cls = os.path.join(_SHIM_CACHE, "sparkgraft", "fs", "NioChmodLocalFs.class")
    if os.path.exists(cls):
        return _SHIM_CACHE
    src_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "javashim")
    srcs = sorted(glob.glob(os.path.join(src_dir, "sparkgraft", "fs", "*.java")))
    javac = shutil.which("javac")
    if not srcs or javac is None:
        return None
    try:
        import pyspark

        hadoop_jars = glob.glob(os.path.join(
            os.path.dirname(pyspark.__file__), "jars", "hadoop-client-api-*.jar"))
        if not hadoop_jars:
            return None
        tmp_out = f"{_SHIM_CACHE}.build.{os.getpid()}"
        os.makedirs(tmp_out, exist_ok=True)
        subprocess.run(
            [javac, "-cp", hadoop_jars[0], "-d", tmp_out, *srcs],
            check=True, capture_output=True, timeout=120,
        )
        try:
            os.rename(tmp_out, _SHIM_CACHE)  # atomic publish; loser keeps
        except OSError:
            shutil.rmtree(tmp_out, ignore_errors=True)
    except (OSError, subprocess.SubprocessError):
        return None
    return _SHIM_CACHE if os.path.exists(cls) else None


def get_spark(
    app_name: str = "tree_sitter_codeviews_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    ui: bool = False,
    extra_conf: dict | None = None,
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
        # AQE coalescing sizes partitions by SHUFFLE BYTES, which is a bad
        # proxy for work in compute-dense stages (explodes, grouped-map /
        # pandas evaluation): profiling showed 1-3 MB shuffles coalesced to
        # 1-2 partitions feeding seconds of per-row compute (DDA raster
        # explode, pair-verify joins, convex-hull grouped maps) on a
        # 32-core box. Lowering the coalesce floor keeps such stages
        # parallel; at production scale stages carry >> cores x 1 MB, so
        # the knob is inert there (coalescing only merges small
        # partitions). Env-parameterised for deployments that prefer the
        # stock 1 MB floor.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
                os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))
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
    shim_cp = _fs_shim_classpath()
    if shim_cp is not None:
        builder = (
            builder.config("spark.driver.extraClassPath", shim_cp)
            .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
                    "sparkgraft.fs.NioChmodLocalFs")
        )
    # Spark 4.1's per-checkpoint-file checksum doubles the small-file count
    # and makes every state-delta close await an async checksum write —
    # profiled at 115/241 executor-thread samples during the stream-stream
    # join drain. At streaming's micro-batch floor (KB-sized deltas) that
    # is ~35-45% of the batch wall; the integrity it adds targets
    # object-store corruption, which local-disk state does not see. A
    # durability-sensitive deployment re-enables it via this env knob.
    if os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM") != "1":
        builder = builder.config(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
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
