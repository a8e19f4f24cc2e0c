#!/usr/bin/env python
"""Back-to-back A/B of a spark conf override on named queries.

Mirrors the frozen bench child protocol (fresh JVM per (query, variant),
sf0.001 warm + target-scale warm, min-of-3 timed .count(), no event log).
Variants alternate A,B,A,B per query so host drift hits both sides.

  python tools/ab_conf.py --sf-dir DIR --conf k=v [--conf k=v ...] q1 q2
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
WARM_SF = "/root/testdata/sf0.001"


def child(name: str, sf_dir: str, confs: dict, out: str) -> None:
    import time

    import __spark_entry__ as entry_mod

    from tree_sitter_codeviews_spark.session import get_spark

    fn = entry_mod.queries()[name]
    spark = get_spark(f"ab-{name}", extra_conf=confs or None)
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    fn(spark, WARM_SF).count()
    fn(spark, sf_dir).count()
    import gc

    gc.collect()
    time.sleep(1)
    dt = float("inf")
    for _ in range(3):
        t0 = time.monotonic()
        fn(spark, sf_dir).count()
        dt = min(dt, time.monotonic() - t0)
    spark.stop()
    with open(out, "w") as fh:
        json.dump({"wall": round(dt, 3)}, fh)


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "child":
        confs = json.loads(args[1])
        child(args[2], args[3], confs, args[4])
        return
    sf_dir = "/root/testdata/sf0.1"
    confs = {}
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        else:
            names.append(args[i])
            i += 1
    results = {}
    for name in names:
        walls = {"A": [], "B": []}
        for _ in range(2):
            for tag, c in (("A", {}), ("B", confs)):
                out = f"/tmp/ab_{name}_{tag}.json"
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "child",
                     json.dumps(c), name, sf_dir, out],
                    check=True, stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL, timeout=1800)
                with open(out) as fh:
                    walls[tag].append(json.load(fh)["wall"])
        results[name] = {k: min(v) for k, v in walls.items()}
        print(f"== {name}: A(base)={walls['A']} B(conf)={walls['B']}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
