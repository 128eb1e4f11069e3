#!/usr/bin/env python3
"""Per-query perf budget gate (round-9, verdict #6).

Any query over BUDGET seconds at sf0.1 in the given bench archive must
appear in docs/PERF_BUDGET.md with a machinery-priced justification.
Run before committing a BENCH_QUERIES_rNN.json archive:

    python3 tools/perf_budget.py bench_out.json

Exit 1 lists unbudgeted queries; add a priced row to PERF_BUDGET.md
(or fix the plan) before archiving.
"""
import json, re, sys
from pathlib import Path

BUDGET = 2.0


def main():
    bench = json.load(open(sys.argv[1] if len(sys.argv) > 1
                           else "bench_out.json"))
    qs = bench.get("queries", bench)
    doc = Path(__file__).resolve().parent.parent / "docs" / "PERF_BUDGET.md"
    allowed = set(re.findall(r"^\|\s*(q\d+)\s*\|", doc.read_text(), re.M))
    over = {k.split("_")[0]: v for k, v in qs.items()
            if isinstance(v, (int, float)) and v > BUDGET}
    bad = {k: v for k, v in over.items() if k not in allowed}
    if bad:
        for k, v in sorted(bad.items(), key=lambda kv: -kv[1]):
            print(f"UNBUDGETED {k} {v:.2f}s > {BUDGET}s - add a priced row "
                  "to docs/PERF_BUDGET.md or fix the plan")
        sys.exit(1)
    print(f"budget ok: {len(over)}/{len(qs)} queries over {BUDGET}s, "
          "all priced in docs/PERF_BUDGET.md")
    sys.exit(0)


if __name__ == "__main__":
    main()
