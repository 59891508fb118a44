#!/usr/bin/env python3
"""Maintain bench_floor.json — per-query historical-minimum seconds.

The floor is Bench's cross-round regression reference: a query whose
in-run min exceeds 2x its floor gets an isolated-fork re-time and is
published under `regressed_isolated` (and `floor_breached` if it still
exceeds the floor after the fold). The in-run spread trigger is blind
to uniformly-slow passes; the floor trigger is not.

Usage:
  python3 tools/update_bench_floor.py BENCH_OUTPUT.json [...]

Each argument is either a raw Bench stdout JSON line (with "runs" or
"queries") or a driver BENCH_r*.json wrapper (whose "tail" holds a
truncated runs fragment). Positive per-query minimums fold into the
committed floor with min(old, new); crash sentinels (negative) are
ignored. Floors only ever go DOWN — a slow round never raises the bar.
"""
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR = os.path.join(ROOT, "bench_floor.json")

# known array-valued metadata names a bench line/artifact carries (or
# might grow) alongside the per-query runs — excluded from the
# runs-array fold unless they are genuinely committed query names
ARRAY_NON_QUERY = {"failed", "isolated", "regressed_isolated",
                   "floor_breached", "stream_isolated", "chunks",
                   "latencies", "runs", "queries"}


def mins_from_text(txt, known=frozenset()):
    """Per-query min over every `"name":[p1,p2,...]` (runs) or bare
    `"name":sec` (queries map) fragment found; robust to truncated
    driver tails that carry only one of the two shapes.

    Today only per-query runs carry a numeric-array value, but that is
    a convention, not a contract — the array pass still excludes the
    known metadata names (ARRAY_NON_QUERY, defense in depth) and the
    committed BenchRegistrySpec floors-name-only-registry-queries
    assertion is the backstop if a future array field slips both.
    The bare-number pass is outright ambiguous — any scalar metadata
    field the bench line grows ("chunks", "value", ...) matches — so
    it folds a name only when it sits inside an explicit
    `"queries":{...}` object or is already a known query (the
    committed floor's key set): an allowlist, not a denylist a new
    field can silently slip past."""
    out = {}

    def fold(name, vals):
        vals = [v for v in vals if v > 0]
        if vals:
            out[name] = min(out.get(name, 1e18), min(vals))

    for m in re.finditer(r'"([A-Za-z0-9_]+)":\[([-0-9.eE,\s]*)\]', txt):
        if m.group(1) in ARRAY_NON_QUERY and m.group(1) not in known:
            continue
        fold(m.group(1),
             [float(v) for v in m.group(2).split(",") if v.strip()])
    qspans = []
    for m in re.finditer(r'"queries":\{', txt):
        end = txt.find("}", m.end())
        qspans.append((m.end(), end if end >= 0 else len(txt)))
    for m in re.finditer(r'"([A-Za-z0-9_]+)":(-?[0-9][-0-9.eE]*)', txt):
        name = m.group(1)
        if name in known or any(s <= m.start() < e for s, e in qspans):
            fold(name, [float(m.group(2))])
    return out


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    floor = {}
    if os.path.isfile(FLOOR):
        floor = json.load(open(FLOOR))
    for path in sys.argv[1:]:
        txt = open(path).read()
        try:
            obj = json.loads(txt)
            if isinstance(obj, dict) and "tail" in obj:
                txt = obj["tail"]
        except ValueError:
            pass
        for k, v in mins_from_text(txt, known=set(floor)).items():
            floor[k] = min(floor.get(k, 1e18), v)
    with open(FLOOR, "w") as f:
        json.dump(dict(sorted(floor.items())), f, indent=1)
        f.write("\n")
    print(f"bench_floor.json: {len(floor)} queries")


if __name__ == "__main__":
    main()
