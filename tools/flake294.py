#!/usr/bin/env python3
"""q294 flake attribution harness (round 7, VERDICT item 1).

The round-6 driver snapshot recorded a single hash mismatch for
q294_stratified_alloc (rows/schema matched, 20 rows both sides) that
no rerun — judge-isolated, judge-in-suite, or ours — reproduces. This
harness establishes which side CAN move by hashing each side N times:

  * oracle side: run the q294 oracle SQL in a fresh DuckDB connection
    N times, canonicalize exactly like tools/check.py (columns sorted
    by name, rows sorted by (isNone, type, str) tuples), sha256 each
    result;
  * spark side: hash an existing Verify output dir the same way, so
    repeated `graft.Verify` runs (SPARK_GRAFT_HASH_DUMP=1 prints an
    in-JVM canonical hash too) can be compared run-to-run.

Usage:
  python3 tools/flake294.py oracle [N] [sfDir] [verifyOutDir]
  python3 tools/flake294.py spark  [verifyOutDir]

Distinct hashes on either side = that side moved; N identical hashes
on both sides = the driver's compare machinery (or its environment)
is the remaining suspect.
"""
import glob
import hashlib
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
NAME = "q294_stratified_alloc"


def canon_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort only via the type-tagged key: raw tuples with NULLs or
    # mixed types are not orderable in py3
    canon = [tuple(r[i] for i in order) for r in rows]
    key = [tuple((v is None, str(type(v)), str(v)) for v in t) for t in canon]
    key.sort()
    h = hashlib.sha256()
    for t in key:
        h.update(repr(t).encode())
    return h.hexdigest()


def oracle(n, sfdir, outdir):
    sql = json.load(open(f"{outdir}/oracle_sql.json"))[NAME]
    hashes = set()
    for i in range(n):
        con = duckdb.connect()  # fresh connection per iteration
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{sfdir}/{t}.parquet')")
        rel = con.sql(sql)
        hh = canon_hash(rel.fetchall(), [c.lower() for c in rel.columns])
        hashes.add(hh)
        print(f"[oracle {i:02d}] {hh}")
        con.close()
    print(f"oracle: {len(hashes)} distinct hash(es) over {n} runs")
    return 0 if len(hashes) == 1 else 1


def spark(outdir):
    files = sorted(glob.glob(f"{outdir}/{NAME}/*.parquet"))
    if not files:
        print(f"no spark result files under {outdir}/{NAME}")
        return 1
    con = duckdb.connect()
    rel = con.sql("SELECT * FROM read_parquet([" +
                  ",".join(f"'{f}'" for f in files) + "])")
    hh = canon_hash(rel.fetchall(), [c.lower() for c in rel.columns])
    print(f"[spark] {hh}")
    return 0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "oracle"
    if mode == "oracle":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
        sfdir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
        outdir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/out_r7"
        sys.exit(oracle(n, sfdir, outdir))
    else:
        outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/out_r7"
        sys.exit(spark(outdir))


if __name__ == "__main__":
    main()
