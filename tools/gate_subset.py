#!/usr/bin/env python
"""Gate a SUBSET of registry queries against their DuckDB oracles — the
fast inner loop for optimization rounds (the full sweep stays
``run_full_gate.py``). Same comparison discipline as the driver.

    python tools/gate_subset.py q1 q2 ... [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from tree_sitter_codeviews_spark.session import get_spark

    import __spark_entry__ as entry
    from tests.oracle_util import assert_matches

    spark = get_spark("gate-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qmap, omap = entry.queries(), entry.oracle_sql()
    failed = []
    for name in args.names:
        fn = qmap[name]
        try:
            if name in omap:
                assert_matches(fn(spark, args.sf_dir), args.sf_dir,
                               omap[name], name)
                print(f"{name}: PASS", flush=True)
            else:
                n1 = fn(spark, args.sf_dir).count()
                n2 = fn(spark, args.sf_dir).count()
                ok = n1 == n2
                print(f"{name}: rows-only ({n1} rows, stable={ok})", flush=True)
                if not ok:
                    failed.append(name)
        except Exception as exc:
            print(f"{name}: FAIL {type(exc).__name__}: {exc}"[:300], flush=True)
            failed.append(name)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
