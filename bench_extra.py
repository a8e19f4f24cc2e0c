#!/usr/bin/env python
"""Round-6 profiling harness (bench.py itself is FROZEN for measurement).

Per guide §1: measure first. This tool reproduces bench.py's child protocol
exactly (fresh JVM per query, one sf0.001 warm + one target-scale warm,
min-of-REPS timed ``.count()``) and adds the evidence bench.py cannot emit:

- ``--mode profile``: per-stage breakdown of the FINAL timed rep, parsed
  from the Spark event log (stage wall, summed task time, task count,
  input/shuffle-read/shuffle-write bytes) so the expensive stage of a slow
  query is identifiable without the UI (disabled in the sandbox).
- ``--mode explain``: ``.explain("formatted")`` captured to
  ``plans/r06/<query>_{before,after}.txt``.
- ``--mode time``: the bench child protocol with NO event log — the event
  log's synchronous per-event writes measurably inflate multi-job queries
  (train_set profiled 4.9 s with the log vs ~3 s without), so before/after
  wall numbers come from this mode and ``profile`` is for stage anatomy.

Usage:
  python bench_extra.py profile  q1 [q2 ...]   # singleton JVM each
  python bench_extra.py time     q1 [q2 ...]   # singleton JVM each, no log
  python bench_extra.py explain  --tag before q1 [q2 ...]
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

WARM_SF = "/root/testdata/sf0.001"
DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events-profile"


def _get_spark_with_eventlog(app: str):
    """session.get_spark (the REAL engine config) + the event log. Keeping
    the configs in one place matters: an early profiler copy drifted from
    session.py and over-reported stages the engine config had fixed."""
    os.makedirs(EVDIR, exist_ok=True)
    from tree_sitter_codeviews_spark import session as tscv_session

    return tscv_session.get_spark(app, extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": EVDIR,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })


def child_profile(name: str, sf_dir: str, reps: int, out_path: str) -> None:
    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    fn = qmap[name]
    spark = _get_spark_with_eventlog(f"profile-{name}")
    app_id = spark.sparkContext.applicationId
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    fn(spark, WARM_SF).count()
    fn(spark, sf_dir).count()  # target-scale warm (bench singleton protocol)
    import gc

    gc.collect()
    time.sleep(1)
    dt = float("inf")
    t_final = None
    for _ in range(reps):
        t0 = time.time()
        tm = time.monotonic()
        fn(spark, sf_dir).count()
        d = time.monotonic() - tm
        if d < dt:
            dt, t_final = d, (t0, t0 + d)
    spark.stop()
    stages = _parse_eventlog(app_id, t_final)
    with open(out_path, "w") as fh:
        json.dump({"query": name, "wall": round(dt, 3), "stages": stages}, fh,
                  indent=1)


def child_time(name: str, sf_dir: str, reps: int, out_path: str) -> None:
    """bench.py's singleton child protocol verbatim (warm sf0.001 + warm
    target + min-of-reps), no event log."""
    import __spark_entry__ as entry_mod

    from tree_sitter_codeviews_spark.session import get_spark

    qmap = entry_mod.queries()
    fn = qmap[name]
    spark = get_spark(f"time-{name}")
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    fn(spark, WARM_SF).count()
    fn(spark, sf_dir).count()
    import gc

    gc.collect()
    time.sleep(1)
    dt = float("inf")
    for _ in range(reps):
        tm = time.monotonic()
        fn(spark, sf_dir).count()
        dt = min(dt, time.monotonic() - tm)
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump({"query": name, "wall": round(dt, 3)}, fh)


def _parse_eventlog(app_id: str, window) -> list[dict]:
    cands = [p for p in glob.glob(os.path.join(EVDIR, "*" + app_id + "*"))
             if os.path.isfile(p)]
    if not cands:
        return []
    path = cands[0]
    stages = []
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except ValueError:
                continue
            if ev.get("Event") != "SparkListenerStageCompleted":
                continue
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub is None or comp is None:
                continue
            if window and not (window[0] * 1000 <= sub <= window[1] * 1000 + 500):
                continue
            acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
            stages.append({
                "stage": si["Stage ID"],
                "name": (si.get("Details") or "").split("\n")[0][:80]
                or si.get("Name", "")[:80],
                "callsite": si.get("Name", "")[:100],
                "wall_ms": comp - sub,
                "n_tasks": si.get("Number of Tasks"),
                "run_ms": acc.get("internal.metrics.executorRunTime"),
                "cpu_ms": (acc.get("internal.metrics.executorCpuTime") or 0) // 1_000_000,
                "input_mb": round((acc.get("internal.metrics.input.bytesRead") or 0) / 1e6, 2),
                "sh_read_mb": round(((acc.get("internal.metrics.shuffle.read.localBytesRead") or 0)
                                     + (acc.get("internal.metrics.shuffle.read.remoteBytesRead") or 0)) / 1e6, 2),
                "sh_write_mb": round((acc.get("internal.metrics.shuffle.write.bytesWritten") or 0) / 1e6, 2),
                "records": acc.get("internal.metrics.shuffle.write.recordsWritten"),
            })
    stages.sort(key=lambda s: -(s["wall_ms"] or 0))
    return stages


def child_explain(name: str, sf_dir: str, tag: str) -> None:
    import __spark_entry__ as entry_mod

    from tree_sitter_codeviews_spark.session import get_spark

    qmap = entry_mod.queries()
    spark = get_spark(f"explain-{name}")
    df = qmap[name](spark, sf_dir)
    out_dir = os.path.join(HERE, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
        fh.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
    spark.stop()


def main() -> None:
    mode = sys.argv[1]
    args = sys.argv[2:]
    tag = "before"
    if args and args[0] == "--tag":
        tag = args[1]
        args = args[2:]
    sf_dir = DEFAULT_SF
    if args and args[0] == "--sf-dir":
        sf_dir = args[1]
        args = args[2:]
    names = args

    if mode == "profile-child":
        child_profile(names[0], sf_dir, int(os.environ.get("PROFILE_REPS", "3")),
                      names[1])
        return
    if mode == "time-child":
        child_time(names[0], sf_dir, int(os.environ.get("PROFILE_REPS", "3")),
                   names[1])
        return
    if mode == "time":
        results = {}
        for name in names:
            out = f"/tmp/time_{name}.json"
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "time-child",
                 "--sf-dir", sf_dir, name, out],
                check=True, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, timeout=1800)
            with open(out) as fh:
                res = json.load(fh)
            results[name] = res["wall"]
            print(f"== {name}: {res['wall']} s", flush=True)
        print(json.dumps(results))
        return
    if mode == "explain-child":
        child_explain(names[0], sf_dir, tag)
        return

    if mode == "profile":
        results = {}
        for name in names:
            out = f"/tmp/profile_{name}.json"
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "profile-child",
                 "--tag", tag, "--sf-dir", sf_dir, name, out],
                check=True, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, timeout=1800)
            with open(out) as fh:
                res = json.load(fh)
            results[name] = res["wall"]
            print(f"== {name}: {res['wall']} s")
            for s in res["stages"][:12]:
                print(f"   stage {s['stage']:>4} wall={s['wall_ms']:>6}ms "
                      f"tasks={s['n_tasks']:>3} run={s['run_ms']}ms cpu={s['cpu_ms']}ms "
                      f"in={s['input_mb']}MB shR={s['sh_read_mb']}MB "
                      f"shW={s['sh_write_mb']}MB  {s['callsite']}")
        print(json.dumps(results))
        return
    if mode == "explain":
        for name in names:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "explain-child",
                 "--tag", tag, "--sf-dir", sf_dir, name],
                check=True, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, timeout=900)
            print(f"explained {name} -> plans/r06/{name}_{tag}.txt")
        return
    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
