#!/bin/bash
# Round-3 bench sweep: path x chunk on the real bench config (1024^2,
# depth-10, fwd+bwd). Results -> scratch/sweep_r03.log
cd /root/repo
export BENCH_ITERS=4
for cfg in "plain 65536" "plain 262144" "brick 65536" "brick 262144"; do
  set -- $cfg
  path=$1; chunk=$2
  echo "=== path=$path chunk=$chunk ===" >> scratch/sweep_r03.log
  BENCH_PATH=$path RTT_TRACE_CHUNK=$chunk timeout 900 python bench.py \
    2>&1 | grep -E "^(#|\{)" >> scratch/sweep_r03.log
done
echo "=== sweep done ===" >> scratch/sweep_r03.log
