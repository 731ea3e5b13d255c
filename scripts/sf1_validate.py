#!/usr/bin/env python3
"""Whole-catalog sf1 validation: driver-style DuckDB compare with
per-oracle subprocess timeouts + a JSON artifact.

check_oracle.py is the fast-path dev gate; at sf1 a handful of oracles
(the graph family's wedge joins, the all-pairs similarity replays) can
legitimately run for many minutes in DuckDB, so each oracle compare
runs in its own subprocess under a wall cap and a timeout is recorded
as `oracle_timeout` (the ENGINE result is still dumped and counted) —
never silently skipped.

Usage:
  python3 scripts/sf1_validate.py <sfDir> <outDir> <artifact.json>
      [timeoutSec] [sparkSecondsJson]
  python3 scripts/sf1_validate.py --one <name> <sfDir> <outDir>   # internal
"""
import json
import math
import subprocess
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(repr(v) for v in vals))
    return [cols[i] for i in order], sorted(out)


def compare_one(name, sf_dir, out_dir):
    import duckdb
    con = duckdb.connect()
    # resource posture for the heavy iterative oracles (unrolled
    # PageRank / k-core chains): fewer threads = fewer concurrent
    # operator buffers, insertion order is irrelevant (canon() re-sorts
    # rows anyway), and spill goes to a dedicated dir on the big
    # partition — the default posture ran the g1b/g5 replays out of
    # temp space at the 10x scale.
    import os
    tmp = os.path.join(out_dir, "_duck_tmp")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET threads=8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    spark_sql = f"SELECT * FROM '{out_dir}/{name}/*.parquet'"

    def types_of(query_sql):
        return {r[0]: r[1] for r in
                con.execute(f"DESCRIBE {query_sql}").fetchall()}
    res = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        gtypes = types_of(spark_sql)
        etypes = types_of(sql)
        got = con.execute(spark_sql)
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        exp = con.execute(sql)
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
        gc, gr = canon(gcols, grows)
        ec, er = canon(ecols, erows)
        res["spark_rows"] = len(grows)
        res["oracle_rows"] = len(erows)
        res["rows_match"] = len(grows) == len(erows)
        res["schema_match"] = gc == ec and all(
            gtypes.get(c) == etypes.get(c) for c in gc)
        res["hash_match"] = gr == er
        if not res["schema_match"]:
            res["err"] = (f"schema: spark={[(c, gtypes.get(c)) for c in gc]} "
                          f"oracle={[(c, etypes.get(c)) for c in ec]}")[:300]
        elif not res["hash_match"]:
            diffs = [(a, b) for a, b in zip(gr, er) if a != b][:2]
            res["err"] = f"first diffs: {diffs}"[:300]
    except Exception as e:  # noqa: BLE001 - recorded, not swallowed
        res["err"] = str(e)[:300]
    print(json.dumps(res))


def main():
    if sys.argv[1] == "--one":
        compare_one(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    sf_dir, out_dir, artifact = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout = float(sys.argv[4]) if len(sys.argv) > 4 else 1800.0
    # Staleness guard: the engine runner copies the sf dir's dataset
    # fingerprint (written by gen_sf1.py) into out_dir at dump time.
    # If either side lacks it, or they disagree, the engine outputs
    # were NOT computed against this data — comparing would reproduce
    # the round-13 mixed-generation artifact (22 false reds). Refuse.
    try:
        sf_man = json.load(open(f"{sf_dir}/MANIFEST.json"))
    except Exception:
        sys.exit(f"REFUSING: {sf_dir}/MANIFEST.json missing/unreadable "
                 f"- regenerate with scripts/gen_sf1.py")
    try:
        out_man = json.load(open(f"{out_dir}/MANIFEST.json"))
    except Exception:
        sys.exit(f"REFUSING: {out_dir}/MANIFEST.json missing/unreadable "
                 f"- engine outputs predate the manifest guard; re-run "
                 f"the QCheck dump against {sf_dir}")
    if sf_man != out_man:
        sys.exit("REFUSING: dataset fingerprint mismatch between "
                 f"{sf_dir} and {out_dir} - engine outputs were "
                 "computed against different data (the round-13 "
                 "staleness trap). Regenerate + re-dump in one session.")
    if sf_man.get("checks_ok") is False:
        sys.exit("REFUSING: the generator recorded failed invariant "
                 "checks for this dataset - regenerate.")
    spark_secs = (json.load(open(sys.argv[5]))
                  if len(sys.argv) > 5 else {})
    # build/serve split (QCheck writes walls.json next to the dumps):
    # spark_sec = build-inclusive dump wall, spark_serve_sec = the
    # second-pass serving wall. Ratio tables must use serve - the
    # round-14 artifact reported s9's cold PQ index build as a 19.2x
    # "serving" decade ratio.
    try:
        walls = json.load(open(f"{out_dir}/walls.json"))
    except Exception:
        walls = {}
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_ok = n_bad = n_to = 0
    for name in sorted(oracles):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--one", name, sf_dir, out_dir],
                capture_output=True, text=True, timeout=timeout)
            res = json.loads(p.stdout.strip().splitlines()[-1])
            res["oracle_sec"] = round(time.time() - t0, 1)
        except subprocess.TimeoutExpired:
            res = {"rows_match": None, "schema_match": None,
                   "hash_match": None, "spark_rows": None,
                   "oracle_rows": None,
                   "err": f"oracle_timeout after {timeout}s",
                   "oracle_sec": round(time.time() - t0, 1)}
        except Exception as e:  # noqa: BLE001
            res = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "spark_rows": None,
                   "oracle_rows": None, "err": str(e)[:300],
                   "oracle_sec": round(time.time() - t0, 1)}
        if name in spark_secs:
            res["spark_sec"] = spark_secs[name]
        if name in walls:
            res["spark_sec"] = walls[name].get("dump_sec",
                                               res.get("spark_sec"))
            res["spark_serve_sec"] = walls[name].get("serve_sec")
        results[name] = res
        ok = bool(res["rows_match"] and res["schema_match"]
                  and res["hash_match"])
        if res.get("err", "") and "oracle_timeout" in str(res.get("err")):
            n_to += 1
            tag = "TIMEOUT"
        elif ok:
            n_ok += 1
            tag = "OK"
        else:
            n_bad += 1
            tag = "FAIL"
        print(f"{tag:7s} {name} ({res.get('oracle_sec')}s)"
              + ("" if ok else f" :: {res.get('err')}"), flush=True)
    with open(artifact, "w") as f:
        json.dump({"sf_dir": sf_dir, "n_ok": n_ok, "n_fail": n_bad,
                   "n_oracle_timeout": n_to, "timeout_sec": timeout,
                   "manifest": sf_man, "queries": results}, f, indent=1)
    print(f"== {n_ok} ok, {n_bad} failed, {n_to} oracle-timeout "
          f"-> {artifact} ==")
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
