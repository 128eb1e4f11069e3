#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sfDir] [verifyOutDir] [query ...]

Reads each `<outDir>/<name>/` parquet result written by graft.Verify,
runs the matching SQL from `<outDir>/oracle_sql.json` in DuckDB over the
raw test tables, then compares: column name set, column-sorted +
row-sorted values, exact equality (reporting whether floats are
bit-exact or merely close, since the driver hashes exact values).
"""
import sys, json, math, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    out.sort(key=key)
    return [cols[i] for i in order], out


def eq(a, b):
    if a is None and b is None:
        return "exact"
    if a is None or b is None:
        return "DIFF"
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return "DIFF"
        if fa == fb or (math.isnan(fa) and math.isnan(fb)):
            return "exact"
        if math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9):
            return "close"
        return "DIFF"
    if a == b:
        return "exact"
    return "DIFF"


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_close = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result files")
            n_fail += 1
            continue
        got_rel = con.sql(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])")
        got_cols = [c.lower() for c in got_rel.columns]
        got_rows = got_rel.fetchall()
        try:
            exp_rel = con.sql(sql)
            exp_cols = [c.lower() for c in exp_rel.columns]
            exp_types = [str(t) for t in exp_rel.types]
            exp_rows = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        # Round-9 root-cause gate: DuckDB widens BIGINT aggregates to
        # HUGEINT (int128). fetchall() masks it (python ints compare
        # equal), but a comparator materializing through pandas/arrow
        # renders HUGEINT differently than the parquet BIGINT — the
        # r6-r8 driver hash-only red cells were EXACTLY the queries
        # whose oracle had a HUGEINT column. Fail loudly here instead.
        huge = [c for c, t in zip(exp_cols, exp_types)
                if "HUGEINT" in t.upper()]
        if huge:
            print(f"FAIL {name}: oracle column(s) {huge} are HUGEINT - "
                  "add CAST(... AS BIGINT) in the oracle SQL")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns differ spark={sorted(got_cols)} "
                  f"oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        gc, gr = canon(got_rows, got_cols)
        ec, er = canon(exp_rows, exp_cols)
        if len(gr) != len(er):
            print(f"FAIL {name}: row count spark={len(gr)} oracle={len(er)}")
            n_fail += 1
            continue
        status, detail = "exact", ""
        for i, (a, b) in enumerate(zip(gr, er)):
            for j, (x, y) in enumerate(zip(a, b)):
                r = eq(x, y)
                if r == "DIFF":
                    status = "DIFF"
                    detail = f"row {i} col {gc[j]}: spark={x!r} oracle={y!r}"
                    break
                if r == "close" and status == "exact":
                    status = "close"
                    detail = f"row {i} col {gc[j]}: spark={x!r} oracle={y!r}"
            if status == "DIFF":
                break
        if status == "exact":
            print(f"PASS {name} ({len(gr)} rows, bit-exact)")
            n_pass += 1
        elif status == "close":
            print(f"WARN {name} ({len(gr)} rows) close-not-exact: {detail}")
            n_close += 1
        else:
            print(f"FAIL {name}: {detail}")
            n_fail += 1
    print(f"\n{n_pass} exact, {n_close} close, {n_fail} fail")
    sys.exit(1 if n_fail or n_close else 0)


if __name__ == "__main__":
    main()
