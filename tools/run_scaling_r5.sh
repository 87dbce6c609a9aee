#!/bin/bash
# Round-5 MERGE scaling pairs (VERDICT r4 next-step #3): measure the
# shuffle-path MERGE 1<->4-core efficiency AT THE SIZE the r4 Amdahl
# fit predicts >=0.85 — 147456 clips (3x the r4 max; the ~4.4 s
# O(metadata) serial term amortizes into the ~150 s scalable rewrite).
# Merge-only (SPARK_GRAFT_SCALE_OPS=merge): SPJ already measured
# 0.91–0.99 in r4 and the big-N synth dominates wall otherwise.
# Protocol otherwise identical to r2–r4: zstd-9, 3 rounds per op with
# round 0 absorbing warmup, min-over-rounds>=1 estimator, interleaved
# 1<->4 pairs on a quiet box (NO other Spark JVM while timing).
cd /root/repo
OUT=tools/scaling_runs_r5.jsonl
for pair in 1 2; do
  for c in 1 4; do
    echo "=== pair $pair cpus $c start $(date +%s) load: $(cat /proc/loadavg)" >> /tmp/scaling_ops_r5.log
    SPARK_GRAFT_CPUS=$c SPARK_GRAFT_SCALE_CLIPS=147456 \
    SPARK_GRAFT_SCALE_OPS=merge SPARK_GRAFT_SCALE_ROUNDS=3 \
      python tools/bench_scaling_ops.py 2>/dev/null | tail -1 >> $OUT
  done
done
echo "=== done $(date +%s)" >> /tmp/scaling_ops_r5.log
