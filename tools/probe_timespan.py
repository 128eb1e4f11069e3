#!/usr/bin/env python3
"""Stage a TIME-SPAN-scaled streaming probe corpus (dev tool).

The round-8 100x streaming wave showed the density-scaled corpus
(probe10x.py: N copies of every event on the SAME time span) measures
interval-join OUTPUT growth (~quadratic in per-user density), not the
engine. This tool scales the other axis, per SCALE.md's design note:
each copy of `events` is shifted FORWARD IN TIME by (span + 1h) per
copy index, keeping user_id and per-copy density identical - N x the
events over N x the time span. Stream-stream interval-join state then
stays bounded by events-in-window (invariant in N), matches grow
LINEARLY, and the probe measures engine throughput + state eviction.

event_id is also offset per copy (dedup/join keys stay unique).
All other tables are copied as-is (the streaming gates only read
events; dims ride along so Tables.load finds a complete sf dir).

Usage: probe_timespan.py [src_sf_dir] [out_dir] [copies]
"""
import shutil, sys
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe_timespan")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 100


def main() -> None:
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    for f in sorted(SRC.glob("*.parquet")):
        if f.stem != "events":
            shutil.copy(f, OUT / f.name)
            print(f"copied {f.stem}")
            continue
        t = pq.read_table(f)
        ts = t.column("ts")
        unit = ts.type.unit
        lo, hi = pc.min(ts).as_py(), pc.max(ts).as_py()
        span_us = int((hi - lo).total_seconds() * 1_000_000) + 3_600_000_000
        per_unit = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 0.001}[unit]
        span_units = int(span_us / per_unit)
        eid_idx = t.schema.get_field_index("event_id")
        ts_idx = t.schema.get_field_index("ts")
        max_eid = pc.max(t.column("event_id")).as_py()
        stride = 1
        while stride <= max_eid:
            stride *= 10
        d = OUT / f.name
        d.mkdir()
        for i in range(COPIES):
            c = t.set_column(
                eid_idx, t.schema.field("event_id"),
                pc.add(t.column("event_id"), i * stride))
            c = c.set_column(
                ts_idx, t.schema.field("ts"),
                pc.add(t.column("ts"),
                       pa.scalar(i * span_units, pa.duration(unit))))
            pq.write_table(c, d / f"part-{i:03d}.parquet")
        print(f"time-shifted events x{COPIES} "
              f"(span {span_us // 1_000_000} s per copy, eid stride {stride})")


if __name__ == "__main__":
    main()
