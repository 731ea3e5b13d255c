#!/usr/bin/env python3
"""Render a SCALING_r*_sf1.json + a same-harness sf0.1 wall file into
the per-query 10x wall table, naming every super-linear row.

Usage: python3 scripts/sf1_report.py SCALING_r14_sf1.json \
           /tmp/sf01_spark_secs.json [> report.md]
"""
import json
import sys


def main():
    art = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    rows = []
    for name, r in sorted(art["queries"].items()):
        # prefer the SERVING wall for the ratio (spark_serve_sec, from
        # QCheck's second pass); the build-inclusive dump wall stays in
        # its own column so one-time index cost remains visible
        s1b = r.get("spark_sec")
        s1 = r.get("spark_serve_sec") or s1b
        s01 = base.get(name)
        ratio = (s1 / s01) if (s1 and s01 and s01 > 0) else None
        rows.append((name, s01, s1, s1b, ratio, r))
    print("| query | sf0.1 s | sf1 serve s | sf1 build s | x | oracle |")
    print("|---|---|---|---|---|---|")
    for name, s01, s1, s1b, ratio, r in rows:
        ok = (r.get("rows_match") and r.get("schema_match")
              and r.get("hash_match"))
        tag = "OK" if ok else ("TIMEOUT" if "timeout" in str(r.get("err"))
                               else "FAIL")
        rs = f"{ratio:.1f}" if ratio is not None else "-"
        print(f"| {name} | {s01} | {s1} | {s1b} | {rs} | {tag} |")
    supers = [(n, f"{q:.1f}") for n, _, _, _, q, _ in rows
              if q is not None and q > 10.0]
    total01 = sum(v for v in base.values())
    total1 = sum(r.get("spark_serve_sec") or r.get("spark_sec") or 0
                 for r in art["queries"].values())
    print(f"\ntotals: sf0.1 {total01:.1f}s -> sf1 {total1:.1f}s "
          f"({total1 / total01:.2f}x for 10x rows)")
    print(f"super-linear rows (>10x wall at 10x rows): {supers or 'none'}")


if __name__ == "__main__":
    main()
