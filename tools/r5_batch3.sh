#!/bin/bash
# Round-5 batch #3: validate + re-profile the recovered default
# (hybrid hoist + eager sort + full permute + dense grid update, 34.70).
set -u
cd /root/repo
L=/tmp/r5_batch3.log
echo "=== r5 batch3 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "numerics gate" python tools/check_tpu_numerics.py
run "profile HEAD 34.7-defaults" python tools/profile_bench.py
run "configs 2-5" python tools/measure_configs.py

echo "=== r5 batch3 done $(date)" >> $L
