#!/bin/bash
# Sharded full-suite Verify for the dev loop (round-7 item: a full
# 444-query sweep is the round's unit of feedback; one sequential
# JVM takes ~6 min wall).  Splits the query list across N parallel
# Verify JVMs (separate out dirs, separate derby metastores so the
# embedded catalogs don't collide), then runs one check.py over the
# merged output.
#
# Usage: tools/verify_shard.sh [N_SHARDS] [SF_DIR] [OUT_ROOT]
# Env:   SPARK_GRAFT_SHARD_CPUS (per-shard threads, default 8)
set -u
N=${1:-4}
SF=${2:-/root/testdata/sf0.01}
OUT=${3:-/tmp/verify_shard}
CPUS=${SPARK_GRAFT_SHARD_CPUS:-8}
cd "$(dirname "$0")/.."

# one compile up front so parallel sbt invocations don't race the
# incremental compiler; runMain below reuses the warm target dir
sbt -batch compile >/dev/null 2>&1 || { echo "compile failed"; exit 1; }

# query list from the compiled classes (no SparkSession needed)
ALL=$(sbt -batch "runMain graft.tools.ListQueries" 2>/dev/null \
  | awk '/^qname /{print $2}' | sort -u)
if [ -z "$ALL" ]; then echo "ListQueries produced nothing"; exit 1; fi
TOTAL=$(echo "$ALL" | wc -l)
echo "sharding $TOTAL queries across $N JVMs x $CPUS cpus"

rm -rf "$OUT"; mkdir -p "$OUT"
i=0
PIDS=()
for shard in $(seq 0 $((N - 1))); do
  LIST=$(echo "$ALL" | awk -v n="$N" -v s="$shard" 'NR % n == s' | paste -sd,)
  (
    SPARK_GRAFT_ONLY="$LIST" SPARK_GRAFT_CPUS=$CPUS \
    sbt -batch \
      -Dderby.system.home="$OUT/derby_$shard" \
      "runMain graft.Verify $SF $OUT/out_$shard" \
      > "$OUT/shard_$shard.log" 2>&1
  ) &
  PIDS+=($!)
done
FAIL=0
for p in "${PIDS[@]}"; do wait "$p" || FAIL=1; done
[ $FAIL -ne 0 ] && echo "WARNING: a shard JVM exited non-zero (see $OUT/shard_*.log)"

# merge: every shard wrote the full oracle_sql.json; results union
MERGED="$OUT/merged"; mkdir -p "$MERGED"
for shard in $(seq 0 $((N - 1))); do
  cp -r "$OUT/out_$shard"/q* "$MERGED/" 2>/dev/null
  cp "$OUT/out_$shard/oracle_sql.json" "$MERGED/" 2>/dev/null
done
python3 tools/check.py "$SF" "$MERGED"
