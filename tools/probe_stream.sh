#!/bin/bash
# Streaming-axis 10x probe (dev tool): run the five streaming gates at
# 1x (sf0.1) and 10x (/tmp/probe10x, staged by tools/probe10x.py) and
# collect wall times + state-store telemetry ([stream] lines).
# Usage: tools/probe_stream.sh [out_prefix]
set -eo pipefail
OUT=${1:-/tmp/probe_stream}
GATES=q133_stream_append,q135_stream_upsert,q185_stream_session,q194_stream_static_enrich,q201_stream_outer_join
for sf in /root/testdata/sf0.1 /tmp/probe10x; do
  tag=$(basename "$sf")
  echo "=== $sf ==="
  SPARK_GRAFT_ONLY=$GATES SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=16 \
    sbt -batch "runMain graft.Bench" 2>&1 | tee "$OUT.$tag.log" | \
    { grep -E "\[bench\] q|\[stream\]" || true; }
done
