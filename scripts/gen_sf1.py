#!/usr/bin/env python3
"""Generate the sf1 (10x sf0.1) validation dataset under target/.

Dev tool only (like check_oracle.py) — the engine never depends on it.
/root/testdata is read-only and ships sf0.001/0.01/0.1; the round-13
whole-catalog-at-10x validation needs one more decade, so this derives
it from sf0.1 deterministically:

  - FACT tables carry the 10x: orders, lineitem, events, documents are
    10 disjoint replicas with primary keys shifted by a 1e6 stride per
    replica (foreign keys into the dims unchanged — a customer now has
    10x orders, a part 10x lineitems, the realistic densification).
  - DIMENSIONS are held at sf0.1 (region nation customer supplier
    part): growing part/supplier keys would break the engine's
    documented data contracts (x14's uid packing needs
    partkey < 1e5, suppkey < 1e4), and dims-at-rest-while-facts-grow
    is the usual warehouse decade anyway.
  - EMBEDDINGS are held at sf0.1's 2000 rows: the driver's own scaling
    is sub-linear (500 -> 500 -> 2000), and replicating vectors
    verbatim would plant thousands of extra cosine-1.0 pairs whose
    LSH escape odds the s3/s7 fixtures were not calibrated for —
    the s-family's scale evidence lives in the SCALING probes.

Replica-key invariants preserved (checked after write):
  - lineitem (l_orderkey, l_linenumber, l_partkey, l_suppkey) unique;
  - event_id unique and < 1e10 (a13/c1 packed-decimal domain);
  - doc_id unique; d12's doc_id < 2000 slice hits replica 0 only.

Usage: python3 scripts/gen_sf1.py [srcDir] [outDir] [replicas]

replicas defaults to 10 (sf0.1 -> sf1, byte-identical to generator v3);
replicas=100 derives the TWO-DECADE probe dataset (sf0.1 -> sf10):
  - the p/q consonant bands rotate by (r%10 + r//10) % 10 so all 100
    text bijections stay pairwise distinct on any text containing one
    b-n and one p-z consonant (for r<10 the extra term is 0: the sf1
    output is unchanged); the cross-replica duplicate-text check still
    verifies the result;
  - the event ts shift steps 1us instead of 10us (99 replicas x 1us
    stays under the 140us minimum inter-event gap, keeping every
    timestamp unique without touching session/window semantics).
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/testdata/sf1"

COPY = ["region", "nation", "customer", "supplier", "part", "embeddings"]
STRIDE = 1000000
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# keep the max shift under the 140us minimum inter-event gap
TS_STEP_US = 10 if REPLICAS <= 14 else 1
SHIFTED = {
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet'")
        print(f"copied {t}")
    for t, key in SHIFTED.items():
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'")
                .fetchall()]

        def col_sel(c):
            if c == key:
                return f"{c} + r.range * {STRIDE} AS {c}"
            if t == "documents" and c == "text":
                # replica r>0 rotates vowels (mod 5), a 10-consonant
                # band and digits (both mod 10) through translate(): a
                # bijection per replica, so each replica keeps the
                # ORIGINAL corpus's internal dup/near-dup structure
                # while replicas share almost no shingles. Verbatim
                # replication would be a corpus no reality produces —
                # every doc duplicated exactly 10x — and it breaks the
                # d6/d16 oracles' documented enumeration assumption
                # (every >=0.8 pair shares a df<=100 shingle) by
                # inflating every shingle df 10x, while the engine's
                # df-insensitive MinHash bands still (correctly) see
                # the pairs. The consonant band is what makes all 10
                # replicas pairwise distinct on ANY real text — with
                # vowels-plus-digits only, digit-free docs collided
                # across replicas 5 apart (r % 5 wraps).
                # every letter band rotates (lowercase, UPPERCASE, and
                # the p-z tail): d16 case-folds before matching, so an
                # unrotated uppercase or p-z run would be rotation-
                # immune and leak cross-replica 8-gram matches
                bands = [("aeiou", 5), ("AEIOU", 5), ("bcdfghklmn", 10),
                         ("BCDFGHKLMN", 10), ("pqrstvwxyz", 10),
                         ("PQRSTVWXYZ", 10), ("0123456789", 10)]
                frm = "".join(b for b, _ in bands)

                def rot(r):
                    # p/q bands take an extra r//10 turn so replicas 10
                    # apart stay distinct bijections (no-op for r<10)
                    def amt(b, m):
                        extra = r // 10 if b[0].lower() == "p" else 0
                        return (r + extra) % m
                    return "".join(b[amt(b, m):] + b[:amt(b, m)]
                                   for b, m in bands)
                cases = " ".join(
                    f"WHEN {r} THEN translate(text, '{frm}', '{rot(r)}')"
                    for r in range(REPLICAS))
                return f"CASE r.range {cases} END AS text"
            if t == "events" and c == "ts":
                # replica r shifted by r*10 microseconds: sf0.1's ts are
                # globally unique with >=140us gaps, so this keeps every
                # timestamp unique WITHOUT changing any session/window/
                # day semantics. Exact-duplicate timestamps would create
                # degenerate order ties the engine/oracle contracts
                # never promise to break identically (LOCF picks, the
                # concurrency sweep, sessionize counts — observed as
                # a2/a5/a14 mismatches on the unshifted draft).
                return (f"CAST(ts AS TIMESTAMP) + "
                        f"to_microseconds(r.range * {TS_STEP_US}) AS ts")
            return c
        sel = ", ".join(col_sel(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"range({REPLICAS}) r ORDER BY {key}) TO '{OUT}/{t}.parquet'")
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"replicated {t}: {n} rows")
    # invariants the engine's data contracts rely on
    checks = [
        ("lineitem 4-tuple unique",
         f"SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber, "
         f"l_partkey, l_suppkey)) FROM '{OUT}/lineitem.parquet'", 0),
        ("event_id unique",
         f"SELECT count(*) - count(DISTINCT event_id) "
         f"FROM '{OUT}/events.parquet'", 0),
        ("event_id < 1e10",
         f"SELECT count(*) FROM '{OUT}/events.parquet' "
         f"WHERE event_id >= 10000000000", 0),
        ("doc_id unique",
         f"SELECT count(*) - count(DISTINCT doc_id) "
         f"FROM '{OUT}/documents.parquet'", 0),
        ("event ts unique (order-tie determinism)",
         f"SELECT count(*) - count(DISTINCT ts) "
         f"FROM '{OUT}/events.parquet'", 0),
        ("no cross-replica duplicate texts (oracle df assumption)",
         f"SELECT count(*) FROM (SELECT md5(text), "
         f"count(DISTINCT doc_id // {STRIDE}) cr "
         f"FROM '{OUT}/documents.parquet' GROUP BY 1 HAVING cr > 1)", 0),
        ("partkey < 1e5 (x14 uid contract)",
         f"SELECT count(*) FROM '{OUT}/lineitem.parquet' "
         f"WHERE l_partkey >= 100000", 0),
        ("suppkey < 1e4 (x14 uid contract)",
         f"SELECT count(*) FROM '{OUT}/lineitem.parquet' "
         f"WHERE l_suppkey >= 10000", 0),
    ]
    bad = 0
    for name, sql, want in checks:
        got = con.execute(sql).fetchone()[0]
        ok = "ok" if got == want else "FAIL"
        bad += got != want
        print(f"check {name}: {got} ({ok})")
    # Dataset fingerprint manifest — the staleness guard. The round-13
    # sweep compared engine outputs computed against generator-v2 data
    # with oracle runs against regenerated v3 data (22 false reds);
    # sf1_validate.py had no provenance binding to notice. The engine
    # runner (QCheck) copies this file into its out_dir, and
    # sf1_validate.py REFUSES to compare when the two disagree.
    # Content hash = order-independent sum of per-row hashes over every
    # column (cheap, catches any value change incl. text rotation).
    # A FAILED generation gets a checks_ok:false manifest carrying NO
    # table fingerprints: sf1_validate.py refuses on the flag (its
    # guard is reachable and load-bearing — ADVICE r15), and without
    # fingerprints the file cannot match QCheck's copy even if the
    # flag were stripped, so known-bad data can never launder into a
    # "clean" compare. (Earlier rounds removed the manifest entirely,
    # which left validate's checks_ok refusal dead code.)
    import json
    import time
    if bad:
        failed = [n for n, sql, want in checks
                  if con.execute(sql).fetchone()[0] != want]
        with open(f"{OUT}/MANIFEST.json", "w") as f:
            json.dump({"generator_version": 4, "checks_ok": False,
                       "generated_unix": int(time.time()),
                       "replicas": REPLICAS, "src": SRC,
                       "failed_checks": failed}, f, indent=1)
        print("invariant checks FAILED - checks_ok:false manifest "
              "written (sf1_validate.py will refuse this dataset)")
        sys.exit(1)
    manifest = {"generator_version": 4,
                "generated_unix": int(time.time()),
                "checks_ok": True, "replicas": REPLICAS,
                "src": SRC, "tables": {}}
    for t in COPY + list(SHIFTED):
        rows, h = con.execute(
            f"SELECT count(*), sum(hash(t)) "
            f"FROM '{OUT}/{t}.parquet' t").fetchone()
        manifest["tables"][t] = {"rows": rows, "hash": str(h)}
    with open(f"{OUT}/MANIFEST.json", "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"manifest -> {OUT}/MANIFEST.json")
    sys.exit(0)


if __name__ == "__main__":
    main()
