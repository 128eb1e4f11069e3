#!/usr/bin/env python3
"""Compare two Bench runs per-query (dev tool).

Usage: bench_diff.py OLD NEW [threshold_s]

OLD/NEW are either Bench stderr logs (lines like
`[bench] q96_bm25  0.756 s ...`) or bench_out.json files. Prints the
shared-set totals, the cost of queries only in NEW, and per-query
regressions/improvements beyond the threshold (default 0.5 s).

Read docs/SCALE.md §storage-discipline before chasing a regression:
one-off environmental jitter (a 6-9x phantom cluster was observed and
vanished on rerun) means a slow query must reproduce across two full
runs before it is real.
"""
import json
import re
import sys


def parse(path: str) -> dict:
    # normalize keys to the pre-underscore prefix: bench_out.json keys
    # are already truncated there (Bench.scala takeWhile(_ != '_')),
    # stderr log lines carry full names — without this a log-vs-json
    # comparison would intersect on NOTHING and hide every regression
    def key(k: str) -> str:
        return k.split("_", 1)[0]
    if path.endswith(".json"):
        return {key(k): v
                for k, v in json.load(open(path))["queries"].items()}
    out = {}
    for line in open(path, errors="ignore"):
        m = re.match(r"\[bench\] (\S+)\s+([\d.]+) s", line)
        if m:
            out[key(m.group(1))] = float(m.group(2))
    return out


def main() -> None:
    old, new = parse(sys.argv[1]), parse(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 0.5
    shared = [(k, old[k], v) for k, v in new.items() if k in old]
    print(f"shared {len(shared)} queries: "
          f"{sum(o for _, o, _ in shared):.1f}s -> "
          f"{sum(v for *_, v in shared):.1f}s")
    only_new = {k: v for k, v in new.items() if k not in old}
    if only_new:
        print(f"new {len(only_new)} queries: {sum(only_new.values()):.1f}s")
    regs = sorted((x for x in shared if x[2] - x[1] > thr),
                  key=lambda x: x[1] - x[2])
    for k, o, v in regs:
        print(f"  REG {k}: {o:.2f} -> {v:.2f} (+{v - o:.2f}s)")
    imps = sorted((x for x in shared if x[1] - x[2] > thr),
                  key=lambda x: x[2] - x[1])
    for k, o, v in imps:
        print(f"  IMP {k}: {o:.2f} -> {v:.2f} (-{o - v:.2f}s)")


if __name__ == "__main__":
    main()
