#!/usr/bin/env python3
"""Compare a BENCH_LAST.json run against a prior round's per-query series.

Usage: bench_compare.py BENCH_LAST.json BENCH_r06.json [ratio_flag]

The prior file may be a driver artifact whose JSON line lives truncated
in a "tail" field — per-query entries are recovered by regex, so even a
clipped tail yields its visible overlap. Compares the CURRENT run's
queries_min (best-of-3) against the prior numbers — rounds before 7
reported best-of-2, so min-vs-min is the apples-to-apples series, while
the median stays the current round's headline.
"""
import json
import re
import sys


def load_series(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except ValueError:
        d = {"tail": raw}
    if "queries_min" in d:
        return d["queries_min"], d.get("queries", {})
    if "queries" in d and isinstance(d["queries"], dict):
        return d["queries"], d["queries"]
    # driver artifact: recover what the truncated tail shows. Anchor at
    # the LAST `"queries"` dict start if present so scalar fields
    # ("value", "sentinel_baseline_sec") and any later queries_min dict
    # can't masquerade as query entries; stop at the first closing
    # brace after the anchor.
    tail = d.get("tail", raw)
    m = re.search(r'"queries":\{', tail)
    region = tail[m.end():] if m else tail
    region = region.split("}", 1)[0]
    pairs = re.findall(r'"([a-z][a-z0-9_]*)":(-?[0-9]+\.[0-9]+)', region)
    scalars = {"value", "sentinel_baseline_sec", "sf", "n", "rc", "cpus"}
    return {k: float(v) for k, v in pairs if k not in scalars}, {}


def main():
    cur_path, prev_path = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    cur_min, cur_med = load_series(cur_path)
    prev, _ = load_series(prev_path)
    overlap = sorted(set(cur_min) & set(prev))
    flagged = []
    for q in overlap:
        # -1.0 is Bench's errored-run marker: a query that went from
        # working to broken is the worst regression, not an unflagged
        # negative ratio
        if cur_min[q] < 0:
            print(f"{q:42s} prev={prev[q]:7.3f} min= ERRORED <-- ")
            flagged.append((q, float("inf")))
            continue
        r = cur_min[q] / prev[q] if prev[q] > 0 else float("inf")
        mark = " <-- " if r > flag else ""
        med = f" med={cur_med[q]:7.3f}" if q in cur_med else ""
        print(f"{q:42s} prev={prev[q]:7.3f} min={cur_min[q]:7.3f}"
              f"{med} ratio={r:5.2f}{mark}")
        if r > flag:
            flagged.append((q, r))
    print(f"\n{len(overlap)} overlapping queries, "
          f"{len(flagged)} above {flag}x: "
          f"{', '.join(f'{q}({r:.2f}x)' for q, r in flagged)}")


if __name__ == "__main__":
    main()
