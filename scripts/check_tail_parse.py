#!/usr/bin/env python3
"""Replica of the round driver's stdout capture: keep only the last
~2000 characters of a bench run's stdout, then try a line-wise JSON
parse of the last parseable line. This is the check that BENCH_r07/r08/
r09 failed (head-truncated full line, then an `[info] `-prefixed
compact line) — run it against a real `sbt -batch "runMain graft.Bench"`
capture before trusting a round's compact-line change.

Usage: check_tail_parse.py <stdout-capture-file> [tail-bytes=2000]
Exit 0 iff the tail contains a whole JSON line with "metric" and
"queries" keys and no sbt prefix.
"""
import json
import sys

path = sys.argv[1]
tail_bytes = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
raw = open(path, "rb").read()[-tail_bytes:].decode("utf-8", "replace")

parsed = None
for line in raw.splitlines():
    # the driver parses lines as-is: an "[info] {...}" line is NOT json
    try:
        d = json.loads(line)
    except ValueError:
        continue
    if isinstance(d, dict) and "metric" in d:
        parsed = d

if parsed is None:
    print(f"FAIL: no parseable metric line in the last {tail_bytes} bytes")
    print("--- tail ---")
    print(raw)
    sys.exit(1)

n_q = len(parsed.get("queries", {}))
print(f"OK: parsed metric line from the {tail_bytes}-byte tail: "
      f"total={parsed.get('value')}s, {n_q} query medians shown, "
      f"contended={parsed.get('contended')}, "
      f"n_queries={parsed.get('n_queries', 'n/a')}, "
      f"line_len={len(json.dumps(parsed, separators=(',', ':')))}")
sys.exit(0)
