#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the engine's headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ..., "pages_per_sec": ...}

The headline metric is total wall-clock over the suite; ``pages_per_sec`` is
the flagship pipeline's throughput (pages -> extract -> encode -> two-phase
PIP join -> triples), the number the north rule's scaling-efficiency bar is
measured on (see ``jobs/scaling_bench.py`` for the N-vs-4N run).

Each query is forced with a cheap-but-complete action
(``count`` after the full plan) so Catalyst can't skip work, and timed
individually.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tree_sitter_codeviews_spark.session import get_spark  # noqa: E402

# headline suite: the north-rule core + one representative per family.
HEADLINE = [
    "geo_pip_entities",   # flagship: extract -> encode -> PIP join
    "geo_pip_best",       # + longest-containment window
    "geo_cell_encode",    # H3-style multi-res encode
    "geo_s2_encode",      # S2-style Hilbert encode (levels 12-16 analogue)
    "geo_tiles",          # raster rollup over the hierarchy
    "geo_knn",            # ring-expansion kNN (iterative)
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_quantized",
    "text_quality",
    "q1_pricing",
    "q5_region_revenue",
    # round-2 additions
    "graph_components",   # iterative min-label propagation + pointer jumping
    "dedup_groups",       # pair graph -> duplicate clusters (CC composition)
    "text_fingerprint",   # JVM-native rolling hash (was per-char Python)
    "graph_grouped_metrics",  # applyInPandas per-graph analytics
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry_mod

    qmap = entry_mod.queries()
    spark = get_spark("bench")

    # warm the JVM, parquet footers, and the Arrow/Python UDF workers once so
    # per-query times measure the work, not process spin-up
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()
    from pyspark.sql import functions as F
    from tree_sitter_codeviews_spark.operators.extract import extract_text_udf

    spark.range(1000).select(
        extract_text_udf(F.encode(F.lit("<p>warm</p>"), "UTF-8"))
    ).count()

    times: dict[str, float] = {}
    total = 0.0
    n_pages = None
    for name in HEADLINE:
        fn = qmap.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        cnt = df.count()
        dt = time.monotonic() - t0
        times[name] = round(dt, 3)
        total += dt
        if name == "geo_pip_entities":
            flagship_dt = dt
            n_pages = spark.read.parquet(
                os.path.join(sf_dir, "documents.parquet")
            ).count()
        del cnt

    pages_per_sec = (
        round(n_pages / flagship_dt, 1) if n_pages and flagship_dt > 0 else None
    )
    print(json.dumps({
        "metric": "headline suite wall-clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "pages_per_sec": pages_per_sec,
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "*"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
