#!/usr/bin/env python3
"""Per-query bench regression gate.

Usage: bench_diff.py PREV.json CURR.json [THRESHOLD]

Diffs the per-query figures of two bench artifacts and FAILS (exit 1)
if any query present in both is slower than THRESHOLD x its prior
figure (default 1.5) AND slower by more than an absolute floor of
0.25 s — the floor keeps sub-100 ms jitter from tripping the gate on
queries whose wall time is dominated by fixed per-query overhead.

Accepted input shapes, auto-detected per file:
  1. A complete Bench.scala line:  {"metric":"total",...,"queries":{...}}
  2. A driver round record whose "tail" field holds a (possibly
     truncated) suffix of that line — every parseable "name":seconds
     pair is salvaged, so older rounds still yield a partial baseline.
"""
import json
import re
import sys

PAIR = re.compile(r'"([A-Za-z0-9_]+)":(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)')
NON_QUERY_KEYS = {"value", "n", "rc", "cpus", "sf"}


def load_queries(path):
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict) and isinstance(obj.get("queries"), dict):
        return {k: float(v) for k, v in obj["queries"].items()}, True
    # driver record: salvage pairs from the truncated tail (the first
    # pair after truncation may have lost leading digits — drop it by
    # skipping anything before the first '"' in the tail)
    tail = obj.get("tail", text) if isinstance(obj, dict) else text
    pairs = {}
    for m in PAIR.finditer(tail[tail.find('"'):]):
        k, v = m.group(1), float(m.group(2))
        if k not in NON_QUERY_KEYS:
            pairs[k] = v
    return pairs, False


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    prev_path, curr_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor_s = 0.25

    prev, prev_full = load_queries(prev_path)
    curr, curr_full = load_queries(curr_path)
    if not prev_full:
        print(f"note: {prev_path} is a truncated driver record; "
              f"baseline covers {len(prev)} queries")
    if not curr:
        sys.exit(f"error: no per-query figures found in {curr_path}")

    common = sorted(set(prev) & set(curr), key=lambda k: -(curr[k] / prev[k] if prev[k] > 0 else 0))
    added = sorted(set(curr) - set(prev))
    removed = sorted(set(prev) - set(curr))

    regressions = []
    print(f"{'query':32s} {'prev_s':>9s} {'curr_s':>9s} {'ratio':>7s}")
    for k in common:
        if prev[k] <= 0 or curr[k] < 0:
            continue  # -1 = errored run; surfaced by the bench itself
        ratio = curr[k] / prev[k]
        flag = ""
        if ratio > threshold and (curr[k] - prev[k]) > floor_s:
            regressions.append(k)
            flag = "  << REGRESSION"
        print(f"{k:32s} {prev[k]:9.3f} {curr[k]:9.3f} {ratio:6.2f}x{flag}")

    pt = sum(prev[k] for k in common if prev[k] > 0 and curr[k] >= 0)
    ct = sum(curr[k] for k in common if prev[k] > 0 and curr[k] >= 0)
    print(f"\ncomparable total: {pt:.1f}s -> {ct:.1f}s over {len(common)} queries")
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"no longer benched ({len(removed)}): {', '.join(removed)}")

    if regressions:
        print(f"\nFAIL: {len(regressions)} quer{'y' if len(regressions)==1 else 'ies'} "
              f"regressed >{threshold}x (+{floor_s}s floor): {', '.join(regressions)}")
        sys.exit(1)
    print(f"\nOK: no query regressed >{threshold}x (+{floor_s}s floor)")


if __name__ == "__main__":
    main()
