#!/usr/bin/env python3
"""Stage a 10x-replicated relational/graph probe corpus (dev tool).

Replicates the sf0.1 fact tables 10x into <out>/:
  - lineitem/orders: order keys re-offset per copy (joins stay 1:N,
    row counts 10x); part/supp/cust keys KEPT, so the supply graph
    gets 10x parallel edges on the same nodes (denser inflow -
    adversarial for PageRank aggregation) and each customer gets 10x
    orders (join fan-out growth).
  - events: event ids re-offset, user_id and ts KEPT - 10x events per
    user in the same time span (denser sessions - adversarial for
    sessionization, sweep-line, and the stream-stream interval join,
    whose per-user match counts grow ~quadratically).
  - dimension tables + documents/embeddings copied as-is.

Each table lands as a DIRECTORY of one parquet file per copy, which
spark.read.parquet() treats identically to a single file.
"""
import shutil, sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe10x")
# optional third arg: replication factor (default 10; 100 for the
# round-7 hundred-x wave)
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10

OFFSETS = {  # table -> columns shifted by copy_index * stride
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    # every doc gains 9 exact text copies - maximally adversarial for
    # dedup/components (duplicate clusters grow 10x denser)
    "documents": ["doc_id"],
}

# optional fourth arg: extra table:idcol pairs to replicate (default
# none — embeddings normally copy as-is). Round-10 use:
#   tools/probe10x.py SRC OUT 10 embeddings:vec_id
# grows the ANN corpus 10x so the fixed-panel ground-truth tiers
# (q513/q494/q497/q498) can be probed for linear pair-frame growth.
for extra in (sys.argv[4].split(",") if len(sys.argv) > 4 else []):
    t, c = extra.split(":")
    OFFSETS[t] = [c]


def main() -> None:
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    # ONE shared stride across every offset table: lineitem and orders
    # must shift l_orderkey/o_orderkey by the SAME amount or each
    # copy's lineitems orphan from their orders (per-table strides
    # break whenever the two maxes straddle a power of 10)
    global_max = max(
        pc.max(pq.read_table(SRC / f"{t}.parquet", columns=cols).column(c)).as_py()
        for t, cols in OFFSETS.items() for c in cols)
    stride = 1
    while stride <= global_max:
        stride *= 10
    for f in sorted(SRC.glob("*.parquet")):
        name = f.stem
        if name not in OFFSETS:
            shutil.copy(f, OUT / f.name)
            print(f"copied {name}")
            continue
        t = pq.read_table(f)
        d = OUT / f.name
        d.mkdir()
        for i in range(COPIES):
            c = t
            for colname in OFFSETS[name]:
                idx = c.schema.get_field_index(colname)
                shifted = pc.add(c.column(colname), i * stride)
                c = c.set_column(idx, c.schema.field(colname), shifted)
            pq.write_table(c, d / f"part-{i:02d}.parquet")
        print(f"replicated {name} x{COPIES} (stride {stride})")


if __name__ == "__main__":
    main()
