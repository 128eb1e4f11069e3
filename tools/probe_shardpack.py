#!/usr/bin/env python3
"""q544 shard-bound probe (round-11, verdict #2).

The sharded packer's scale claim is that per-task fold state is
bounded by the shard width (doc_id div 64), not the corpus. This
checks the bound directly on the gate corpus and on a 10x-replicated
one (tools/probe10x.py output, doc_id re-offset per copy): the max
docs in any (source, shard) group must stay <= 64 while the corpus
grows 10x, and the number of groups (= parallel fold tasks) must grow
~linearly.

Usage: probe_shardpack.py [sf_dir] [probe10x_dir]
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
P10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/probe10x"

Q = """
WITH d AS (
  SELECT doc_id, source,
    len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        t -> t != '')) AS n
  FROM read_parquet('{path}')
  WHERE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
        t -> t != '')) > 0),
g AS (
  SELECT source, doc_id // 64 AS sh, COUNT(*) AS docs
  FROM d GROUP BY 1, 2)
SELECT COUNT(*) AS n_groups, MAX(docs) AS max_docs_per_group,
  CAST(SUM(docs) AS BIGINT) AS n_docs
FROM g
"""

con = duckdb.connect()
for tag, path in (("1x", f"{SF}/documents.parquet"),
                  ("10x", f"{P10}/documents.parquet/*.parquet")):
    try:
        row = con.execute(Q.format(path=path)).fetchone()
    except Exception as e:  # probe corpus may not be staged
        print(f"{tag}: skipped ({e})")
        continue
    print(f"{tag}: n_docs={row[2]} fold_groups={row[0]} "
          f"max_docs_per_group={row[1]} (bound: 64)")
    assert row[1] <= 64, "shard bound violated"
