#!/usr/bin/env python3
"""Assemble the two-decade (sf10) engine-wall artifact.

Dev tool. The sf10 dataset (100 replicas of sf0.1; scripts/gen_sf1.py
with replicas=100) is ORACLE-OPTIONAL by design: DuckDB replays of the
worst rows are infeasible at this scale (d12b's oracle alone would run
hours), so this artifact records ENGINE walls only — the question it
answers is "does the sf1->sf10 decade stay within the linear bound the
sf0.1->sf1 decade predicted", not correctness (the same code is
oracle-green at sf0.01 and sf1).

Reads walls.json files produced by QCheck runs against the sf0.1, sf1
and sf10 dirs (dump_sec = build-inclusive, serve_sec = warm serving
pass; ratios use serve), plus each dataset's MANIFEST.json when
present, and emits the artifact.

Usage:
  python3 scripts/sf10_probe.py <sf01walls> <sf1walls> <sf10walls> \
      <sf10dir> <artifact.json>
"""
import json
import sys


def main():
    w01 = json.load(open(sys.argv[1]))
    w1 = json.load(open(sys.argv[2]))
    w10 = json.load(open(sys.argv[3]))
    sf10_dir = sys.argv[4]
    artifact = sys.argv[5]
    try:
        man = json.load(open(f"{sf10_dir}/MANIFEST.json"))
    except Exception:
        sys.exit(f"REFUSING: {sf10_dir}/MANIFEST.json missing - the "
                 "sf10 generation must pass its invariant checks")
    rows = {}
    modes = {f: w.pop("_mode", "dump_build")
             for f, w in (("sf0.1", w01), ("sf1", w1), ("sf10", w10))}
    for name in sorted(w10):
        s01 = w01.get(name, {}).get("serve_sec")
        s1 = w1.get(name, {}).get("serve_sec")
        s10 = w10[name].get("serve_sec")
        rows[name] = {
            "sf0.1_serve_sec": s01,
            "sf1_serve_sec": s1,
            "sf10_serve_sec": s10,
            "sf10_build_sec": w10[name].get("dump_sec"),
            "decade1_ratio": round(s1 / s01, 2) if s01 and s1 else None,
            "decade2_ratio": round(s10 / s1, 2) if s1 and s10 else None,
        }
        # weather evidence (round 16): per-pass hypervisor-steal cores
        # from QCheck — a ratio whose numerator or denominator was
        # measured under a steal burst names itself
        steal = {f"{sf}_serve_steal_cores": w.get(name, {}).get("serve_steal_cores")
                 for sf, w in (("sf0.1", w01), ("sf1", w1), ("sf10", w10))}
        rows[name].update({k: v for k, v in steal.items() if v is not None})
    with open(artifact, "w") as f:
        json.dump({"sf10_dir": sf10_dir, "manifest": man,
                   "build_wall_modes": modes,
                   "note": "engine serve walls only; oracle infeasible "
                           "at sf10 (see script docstring). "
                           "sf10_build_sec semantics follow "
                           "build_wall_modes: dump_build = build + "
                           "coalesce(1) + single-file parquet encode; "
                           "noop_build = cache-cleared noop pass "
                           "(no write overhead).",
                   "queries": rows}, f, indent=1)
    print(f"-> {artifact}")
    for n, r in rows.items():
        print(f"{n}: d1={r['decade1_ratio']}x d2={r['decade2_ratio']}x "
              f"(sf10 serve {r['sf10_serve_sec']}s)")


if __name__ == "__main__":
    main()
