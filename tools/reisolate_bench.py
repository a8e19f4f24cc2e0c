#!/usr/bin/env python
"""Re-quote a contaminated BENCH_LOCAL.json on a quiet host.

The r5 overnight orchestrator's isolation pass ran under co-tenant load, so
some singleton re-times came back ABOVE their own screen values (web_ingest
25.2 s isolated vs 6.1 s screened at sf0.1) — the opposite distortion the
pass exists to remove. bench.py now records ``min(screen, isolated)``
going forward; this tool repairs an existing artifact under the same rule:

1. apply ``min(times, screen)`` to every block (pure bookkeeping), then
2. re-time, in fresh singleton JVMs, every query whose final still exceeds
   ``ISOLATE_THRESHOLD`` and whose record is suspect — either its original
   isolation came back above screen (contaminated) or it was budget-skipped
   (screen-only) — taking the min across all observations, then
3. recompute block totals and rewrite the artifact with the protocol note.

Per-block wall budget, spent in descending-final order, same as bench.py.

Usage: python tools/reisolate_bench.py [--budget-s 1500] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import (  # noqa: E402
    FULL_ARTIFACT,
    ISOLATE_THRESHOLD,
    REPS_HEADLINE,
    REPS_SF2,
    STAGE_PLAN,
    _run_child,
    _run_stage_plan,
)


def _min_rule(block: dict) -> None:
    screen = block.get("screen", {})
    times = block["queries"]
    for name, sv in screen.items():
        if name in times:
            times[name] = min(times[name], sv)


def _candidates(block: dict, all_mode: bool = False) -> list[str]:
    times = block["queries"]
    screen = block.get("screen", {})
    skipped = set(block.get("iso_skipped", []))
    out = []
    for name, t in times.items():
        if t <= ISOLATE_THRESHOLD:
            continue
        contaminated = name in screen and screen[name] <= t
        if all_mode or contaminated or name in skipped:
            out.append(name)
    return sorted(out, key=lambda n: -times[n])


def _requote_block(block: dict, sf_dir: str, reps: int,
                   budget_s: float, dry: bool,
                   all_mode: bool = False) -> None:
    _min_rule(block)
    cands = _candidates(block, all_mode)
    times = block["queries"]
    print(f"[{sf_dir}] {len(cands)} candidates:",
          {n: times[n] for n in cands}, flush=True)
    if dry:
        return
    skipped = set(block.get("iso_skipped", []))
    t0 = time.monotonic()
    for name in cands:
        if time.monotonic() - t0 > budget_s:
            print(f"  budget out at {name}", flush=True)
            break
        res = _run_child([
            "--mode", "queries", "--names", name,
            "--sf-dir", sf_dir, "--reps", str(reps),
        ])
        new = res["times"][name]
        old = times[name]
        times[name] = min(old, new)
        skipped.discard(name)  # it now has a quiet-host singleton quote
        if name == "geo_pip_entities" and new <= old and res.get("pages_per_sec"):
            block["pages_per_sec"] = res["pages_per_sec"]
        print(f"  {name}: {old:.2f} -> {times[name]:.2f} "
              f"(requote {new:.2f})", flush=True)
    block["iso_skipped"] = sorted(skipped)
    key = "value" if "value" in block else "wall"
    block[key] = round(sum(times.values()), 3)


def _requote_stages(full: dict, block_key: str, sf_dir: str,
                    reps: int) -> None:
    """Re-run the per-stage plan (fresh JVM per stage, bench.py protocol)
    and keep min(old, new) per stage wall; deltas of cumulative plans are
    recomputed from the min walls."""
    old = full.get("stages", {}).get(block_key, {})
    new = _run_stage_plan(sf_dir, reps)
    for qname, stages in new.items():
        prev = 0.0
        cumulative = STAGE_PLAN[qname][1]
        for sname, entry in stages.items():
            old_wall = old.get(qname, {}).get(sname, {}).get("wall", float("inf"))
            entry["wall"] = min(entry["wall"], old_wall)
            if cumulative:
                entry["delta"] = round(entry["wall"] - prev, 3)
                prev = entry["wall"]
        print(f"[stages {block_key}] {qname}:",
              {s: e["wall"] for s, e in stages.items()}, flush=True)
    full.setdefault("stages", {})[block_key] = new


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-s", type=float, default=1500.0)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--stages-only", action="store_true",
                    help="only re-run the per-stage plans (min rule)")
    ap.add_argument("--all", action="store_true", dest="all_mode",
                    help="requote EVERY query above the isolation "
                         "threshold, not just suspect records — useful "
                         "after a warm-up protocol change makes singleton "
                         "quotes strictly better")
    args = ap.parse_args()

    full = json.load(open(FULL_ARTIFACT))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf2 = full.get("sf2")
    sf2_dir = os.environ.get("SPARK_GRAFT_SF2_DIR", "/tmp/spark_graft_sf1eq")
    if sf2 and not os.path.exists(os.path.join(sf2_dir, "_READY")):
        prep = _run_child(["--mode", "sf2prep", "--sf-dir", sf_dir])
        sf2_dir = prep["sf2_dir"]

    if args.stages_only:
        _requote_stages(full, "sf", sf_dir, REPS_HEADLINE)
        if sf2:
            _requote_stages(full, "sf2", sf2_dir, REPS_SF2)
        with open(FULL_ARTIFACT, "w") as fh:
            json.dump(full, fh, indent=1)
        print("rewrote", FULL_ARTIFACT, flush=True)
        return

    _requote_block(full, sf_dir, REPS_HEADLINE, args.budget_s, args.dry_run,
                   args.all_mode)
    if sf2:
        _requote_block(sf2, sf2_dir, REPS_SF2, args.budget_s, args.dry_run,
                       args.all_mode)

    if not args.dry_run:
        full.setdefault("protocol", {})["final_rule"] = (
            "min(screen, isolated, quiet-host requote)"
        )
        with open(FULL_ARTIFACT, "w") as fh:
            json.dump(full, fh, indent=1)
        print("rewrote", FULL_ARTIFACT, flush=True)


if __name__ == "__main__":
    main()
