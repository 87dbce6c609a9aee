#!/bin/bash
# Round-3 scaling re-run (VERDICT r2 item 10): the SAME protocol and
# estimator as rounds 1-2 (49,152 clips, zstd level 9, Z-order rewrites,
# min over post-warmup rounds), interleaved 1,4,1,4 JVMs on the
# north-rule pair. Appends one JSON line per JVM to
# tools/scaling_runs_r3.jsonl.
set -e
cd /root/repo
OUT=tools/scaling_runs_r3.jsonl
for CPUS in 1 4 1 4; do
  echo "=== JVM cpus=$CPUS $(date -u +%H:%M:%S) ===" >&2
  SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_SCALE_CLIPS=49152 \
  SPARK_GRAFT_SCALE_CODEC=zstd SPARK_GRAFT_SCALE_ZSTD_LEVEL=9 \
    python tools/bench_scaling.py 2>/dev/null | tail -1 >> "$OUT"
done
echo "SCALING R3 DONE" >&2
