#!/usr/bin/env python3
"""Canonicalization-seam verifier (round-9, verdict #5).

Reads a parquet file through DuckDB — the oracle's exact read path —
and compares every cell BIT-EXACTLY against an expected-values JSON
written by the Scala side (CanonSeamSpec). Doubles travel as raw IEEE
bit patterns in the JSON so no decimal repr is ever compared; dates as
ISO strings; timestamps as epoch micros; everything else as native
JSON. Exit 0 = every cell identical; any seam (type rendered
differently across the dump boundary, value mutated by the parquet
writer or the DuckDB reader) exits 1 with the first offending cell.

Also fails if DuckDB reports any result column as HUGEINT/DECIMAL —
types a pandas/arrow-path comparator renders differently than the
JVM side (the r6-r8 red-cell class).

Usage: seam_check.py <parquet_glob_dir> <expected.json>
"""
import sys, json, glob, math, struct, datetime

import duckdb


def f64_bits(x):
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def main():
    pdir, expath = sys.argv[1], sys.argv[2]
    files = sorted(glob.glob(f"{pdir}/*.parquet"))
    if not files:
        print(f"seam: no parquet files under {pdir}")
        sys.exit(1)
    exp = json.load(open(expath))
    con = duckdb.connect()
    rel = con.sql("SELECT * FROM read_parquet([" +
                  ",".join(f"'{f}'" for f in files) + "])")
    cols = list(rel.columns)
    types = [str(t).upper() for t in rel.types]
    for c, t in zip(cols, types):
        if "HUGEINT" in t or "DECIMAL" in t:
            print(f"seam: column {c} reads back as {t}")
            sys.exit(1)
    rows = rel.fetchall()
    if sorted(cols) != sorted(exp["columns"]):
        print(f"seam: columns {sorted(cols)} != expected {sorted(exp['columns'])}")
        sys.exit(1)
    # key rows by the id column so ordering never matters
    idi = cols.index("id")
    byid = {r[idi]: r for r in rows}
    if len(byid) != len(exp["rows"]):
        print(f"seam: {len(byid)} rows != expected {len(exp['rows'])}")
        sys.exit(1)
    for erow in exp["rows"]:
        rid = int(erow["id"]["v"])
        got = byid.get(rid)
        if got is None:
            print(f"seam: row id={rid} missing")
            sys.exit(1)
        for j, c in enumerate(cols):
            e = erow[c]
            g = got[j]
            t, v = e["t"], e.get("v")
            if v is None:
                if g is not None:
                    print(f"seam: id={rid} col={c}: expected NULL, got {g!r}")
                    sys.exit(1)
                continue
            if g is None:
                print(f"seam: id={rid} col={c}: expected {v!r}, got NULL")
                sys.exit(1)
            if t == "double":
                ok = isinstance(g, float) and f64_bits(g) == int(v)
                shown = f"bits={f64_bits(g) if isinstance(g, float) else g!r}"
            elif t == "long" or t == "int":
                ok = isinstance(g, int) and g == int(v)
                shown = repr(g)
            elif t == "bool":
                # v arrives as "1"/"0" - bool("0") would be True
                ok = isinstance(g, bool) and g == (str(v) == "1")
                shown = repr(g)
            elif t == "string":
                ok = isinstance(g, str) and g == v
                shown = repr(g)
            elif t == "date":
                ok = isinstance(g, datetime.date) and g.isoformat() == v
                shown = repr(g)
            elif t == "ts_micros":
                # DuckDB returns naive datetimes for NTZ parquet
                # // keeps the division exact (timedelta / timedelta is
                # a float and loses precision at year-9999 magnitudes)
                ok = (isinstance(g, datetime.datetime) and g.tzinfo is None
                      and (g - datetime.datetime(1970, 1, 1))
                      // datetime.timedelta(microseconds=1) == int(v))
                shown = repr(g)
            else:
                print(f"seam: unknown expected type tag {t}")
                sys.exit(1)
            if not ok:
                print(f"seam: id={rid} col={c} type={t}: "
                      f"expected {v!r}, got {shown} (py {type(g).__name__})")
                sys.exit(1)
    print(f"seam: {len(byid)} rows x {len(cols)} cols bit-identical "
          "through parquet->DuckDB")
    sys.exit(0)


if __name__ == "__main__":
    main()
