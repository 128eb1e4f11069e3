#!/bin/bash
# Sharded full-suite Verify for the dev loop (round-7 item: a full
# 444-query sweep is the round's unit of feedback; one sequential
# JVM takes ~6 min wall).  Splits the query list across N parallel
# plain-java Verify JVMs (concurrent sbt invocations in one project
# dir race the zinc analysis — so sbt runs exactly once up front to
# compile and export the classpath, and the shards are `java -cp`),
# each with its own out dir and derby home, then runs one check.py
# over the merged output.
#
# Usage: tools/verify_shard.sh [N_SHARDS] [SF_DIR] [OUT_ROOT]
# Env:   SPARK_GRAFT_SHARD_CPUS (per-shard threads, default 8)
set -u
N=${1:-4}
SF=${2:-/root/testdata/sf0.01}
OUT=${3:-/tmp/verify_shard}
CPUS=${SPARK_GRAFT_SHARD_CPUS:-8}
cd "$(dirname "$0")/.."

# one sbt invocation: compile + runtime classpath (last stdout line)
CP=$(sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1)
case "$CP" in
  */classes*) ;;
  *) echo "classpath export failed: $CP"; exit 1 ;;
esac

ALL=$(java -cp "$CP" graft.tools.ListQueries 2>/dev/null \
  | awk '/^qname /{print $2}' | sort -u)
if [ -z "$ALL" ]; then echo "ListQueries produced nothing"; exit 1; fi
TOTAL=$(echo "$ALL" | wc -l)
echo "sharding $TOTAL queries across $N JVMs x $CPUS cpus"

rm -rf "$OUT"; mkdir -p "$OUT"
PIDS=()
for shard in $(seq 0 $((N - 1))); do
  LIST=$(echo "$ALL" | awk -v n="$N" -v s="$shard" 'NR % n == s' | paste -sd,)
  (
    SPARK_GRAFT_ONLY="$LIST" SPARK_GRAFT_CPUS=$CPUS \
    java -cp "$CP" \
      --add-exports=java.base/sun.nio.ch=ALL-UNNAMED \
      --add-opens=java.base/java.lang=ALL-UNNAMED \
      --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
      --add-opens=java.base/java.util=ALL-UNNAMED \
      --add-opens=java.base/java.nio=ALL-UNNAMED \
      --add-opens=java.base/sun.security.action=ALL-UNNAMED \
      --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
      --add-opens=java.base/java.io=ALL-UNNAMED \
      --add-opens=java.base/java.net=ALL-UNNAMED \
      --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
      --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
      -Xmx12g -Dderby.system.home="$OUT/derby_$shard" \
      graft.Verify "$SF" "$OUT/out_$shard" \
      > "$OUT/shard_$shard.log" 2>&1
  ) &
  PIDS+=($!)
done
FAIL=0
for p in "${PIDS[@]}"; do wait "$p" || FAIL=1; done
if [ $FAIL -ne 0 ]; then
  echo "ERROR: a shard JVM exited non-zero (see $OUT/shard_*.log);"
  echo "missing shards would surface as spurious check.py failures."
  exit 1
fi

# merge: every shard wrote the full oracle_sql.json; results union
MERGED="$OUT/merged"; mkdir -p "$MERGED"
for shard in $(seq 0 $((N - 1))); do
  cp -r "$OUT/out_$shard"/q* "$MERGED/" 2>/dev/null
  cp "$OUT/out_$shard/oracle_sql.json" "$MERGED/" 2>/dev/null
done
# shards run selection-limited, so each writes _canon_hashes_partial
# (never the full-run well-known name); the union IS the full-sweep
# canonical-hash snapshot the round-end HASHES_rNN.json copy reads
python3 - "$OUT" "$N" <<'PYEOF'
import json, sys, os
out, n = sys.argv[1], int(sys.argv[2])
merged = {}
for shard in range(n):
    p = os.path.join(out, f"out_{shard}", "_canon_hashes_partial.json")
    if os.path.exists(p):
        merged.update(json.load(open(p)))
with open(os.path.join(out, "merged", "_canon_hashes.json"), "w") as f:
    json.dump(dict(sorted(merged.items())), f, indent=0)
print(f"[shard-merge] {len(merged)} canonical hashes")
PYEOF
python3 tools/check.py "$SF" "$MERGED"
