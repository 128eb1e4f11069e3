#!/usr/bin/env python3
"""Stage an adversarially SKEWED variant of a testdata SF dir (dev
tool — round-7 item 4: the 10x probes replicate volume uniformly;
this probe concentrates it).

One "viral" value owns ~10% of the rows in every skew-sensitive
column, with total row counts unchanged, so any slowdown vs the
un-skewed base dir is pure straggler/skew cost, not data volume:

  - orders:   rows with o_orderkey % 10 == 0 get o_custkey = 1 (hot
              customer: join fan-out, per-customer windows) and
              o_orderdate = 1995-06-15 (hot day: date-partitioned
              writes, day-grain aggregates all land one group).
  - lineitem: rows with l_orderkey % 10 == 0 get l_partkey = 1 and
              l_suppkey = 1 (hot item: basket co-occurrence pairs
              explode quadratically on one reducer; hot supplier for
              graph edges).
  - events:   rows with event_id % 10 == 0 get user_id = 1 (hot
              user: sessionization, per-user lag windows, streaming
              dedup state all concentrate on one key).
  - documents: rows with doc_id % 10 == 0 get one shared text (a
              10%-of-corpus exact-duplicate class: dedup pipelines,
              shingle joins, LSH buckets) and source = 'hot'.

Other tables copy as-is.  Usage:
  python3 tools/probe_skew.py [src_sf_dir] [out_dir]
"""
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_skew")

HOT_TEXT = ("the quick brown fox jumps over the lazy dog and then "
            "does it again and again for every duplicated document "
            "in the viral cluster")


def mod10(col):
    # pyarrow.compute has no mod; subtract 10*floor(x/10)
    d = pc.floor(pc.divide(pc.cast(col, pa.float64()), 10.0))
    return pc.subtract(pc.cast(col, pa.int64()),
                       pc.multiply(pc.cast(d, pa.int64()), 10))


def override(table, mask, colname, value):
    idx = table.schema.get_field_index(colname)
    col = table.column(colname)
    field = table.schema.field(colname)
    val = pa.scalar(value, type=field.type)
    new = pc.if_else(mask, val, col)
    return table.set_column(idx, field, new)


def main():
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    for f in sorted(SRC.glob("*.parquet")):
        name = f.stem
        t = pq.read_table(f)
        if name == "orders":
            mask = pc.equal(mod10(t.column("o_orderkey")), 0)
            t = override(t, mask, "o_custkey", 1)
            # o_orderdate may be date32 or timestamp depending on gen
            import datetime
            dt = t.schema.field("o_orderdate").type
            hot_day = (datetime.date(1995, 6, 15) if pa.types.is_date(dt)
                       else datetime.datetime(1995, 6, 15))
            t = override(t, mask, "o_orderdate", hot_day)
        elif name == "lineitem":
            mask = pc.equal(mod10(t.column("l_orderkey")), 0)
            t = override(t, mask, "l_partkey", 1)
            t = override(t, mask, "l_suppkey", 1)
        elif name == "events":
            mask = pc.equal(mod10(t.column("event_id")), 0)
            t = override(t, mask, "user_id", 1)
        elif name == "documents":
            mask = pc.equal(mod10(t.column("doc_id")), 0)
            t = override(t, mask, "text", HOT_TEXT)
            t = override(t, mask, "source", "hot")
        pq.write_table(t, OUT / f.name)
        n = t.num_rows
        print(f"staged {name}: {n} rows")


if __name__ == "__main__":
    main()
