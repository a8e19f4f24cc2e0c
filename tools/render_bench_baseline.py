#!/usr/bin/env python
"""Render the BASELINE.md round-N bench section from BENCH_LOCAL.json.

Emits markdown to stdout: headline/sf1-eq summaries, the two-pass
isolation accounting (screen vs final for every isolated query), the
per-stage tables for the two end-to-end composites, and the slowest-query
lists. Paste-ready; prose context is added by hand around it.
"""

from __future__ import annotations

import json
import os
import sys


def fmt_queries(qs: dict[str, float], n: int = 10) -> str:
    rows = sorted(qs.items(), key=lambda kv: -kv[1])[:n]
    return "\n".join(f"| `{k}` | {v:.2f} |" for k, v in rows)


def fmt_screen(qs: dict[str, float], screen: dict[str, float]) -> str:
    rows = sorted(screen.items(), key=lambda kv: -(kv[1] - qs[kv[0]]))
    out = []
    for k, sv in rows:
        fv = qs[k]
        ratio = sv / fv if fv > 0 else float("inf")
        out.append(f"| `{k}` | {sv:.2f} | {fv:.2f} | {ratio:.1f}x |")
    return "\n".join(out)


def fmt_stages(st: dict[str, dict]) -> str:
    out = []
    for qname, stages in st.items():
        for sname, entry in stages.items():
            out.append(f"| `{qname}` | {sname} | {entry['wall']:.2f} |")
    return "\n".join(out)


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LOCAL.json",
    )
    d = json.load(open(path))
    sf2 = d.get("sf2") or {}
    print(f"""\
- **sf{d['sf']}: {d['value']:.1f} s total over {len(d['queries'])} queries,
  flagship `geo_pip_entities` {d['queries']['geo_pip_entities']:.2f} s
  ({d['pages_per_sec']:.0f} pages/s).**
- **sf1-equivalent: {sf2.get('wall', 0):.1f} s total over
  {len(sf2.get('queries', {}))} queries, flagship
  {sf2.get('queries', {}).get('geo_pip_entities', 0):.2f} s
  ({sf2.get('pages_per_sec', 0):.0f} pages/s).**

Slowest at sf{d['sf']}:

| query | sec |
|---|---|
{fmt_queries(d['queries'])}

Slowest at sf1-equivalent:

| query | sec |
|---|---|
{fmt_queries(sf2.get('queries', {}))}

Isolation accounting at sf{d['sf']} (screen = chunked value, final =
singleton-JVM value; every isolated query listed):

| query | screen s | final s | inflation |
|---|---|---|---|
{fmt_screen(d['queries'], d.get('screen', {}))}

Isolation accounting at sf1-equivalent:

| query | screen s | final s | inflation |
|---|---|---|---|
{fmt_screen(sf2.get('queries', {}), sf2.get('screen', {}))}

iso_skipped (screen-only values): sf={d.get('iso_skipped', [])},
sf2={sf2.get('iso_skipped', [])}

Per-stage timings (fresh JVM per stage; build inside the timed region):

| query | stage | sec |
|---|---|---|
{fmt_stages(d.get('stages', {}).get('sf', {}))}

sf1-equivalent stages:

| query | stage | sec |
|---|---|---|
{fmt_stages(d.get('stages', {}).get('sf2', {}))}
""")


if __name__ == "__main__":
    main()
