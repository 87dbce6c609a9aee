#!/bin/bash
cd /root/repo
OUT=tools/scaling_runs_r4.jsonl
for pair in 1 2; do
  for c in 1 4; do
    echo "=== pair $pair cpus $c start $(date +%s) load: $(cat /proc/loadavg)" >> /tmp/scaling_ops.log
    SPARK_GRAFT_CPUS=$c python tools/bench_scaling_ops.py 2>/dev/null | tail -1 >> $OUT
  done
done
echo "=== done $(date +%s)" >> /tmp/scaling_ops.log
# big pair (serial-term amortization evidence):
#   SPARK_GRAFT_SCALE_CLIPS=49152 at cpus 1 then 4, same output file
