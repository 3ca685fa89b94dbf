#!/bin/bash
# Round-4 measurement queue, phase 2 (after the chan-free regression fix:
# gathered channels are the default again, HEAD baseline 30.72 steps/s at
# 1M vs the beec347 control's 34.24).  Sequential; logs to
# /tmp/tpu_batch2.log.  Knob A/Bs re-run on the FIXED default baseline.
cd /root/repo
L=/tmp/tpu_batch2.log
echo "=== batch2 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3000 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "gate: numerics (gathered default)" python tools/check_tpu_numerics.py
run "A/B: PERM_CHUNK=1024" env WGSPARKL_PERM_CHUNK=1024 python bench.py
run "A/B: PERM_CHUNK=512" env WGSPARKL_PERM_CHUNK=512 python bench.py
run "A/B: BCHUNK=512" env BENCH_BCHUNK=512 python bench.py
run "A/B: EAGER_SORT=1" env BENCH_EAGER_SORT=1 python bench.py
run "A/B: PHYS_DOT=x3" env WGSPARKL_PHYS_DOT=x3 python bench.py
run "sparse at 1M" env BENCH_SPARSE=1 python bench.py
run "configs 2-5" python tools/measure_configs.py

echo "=== batch2 done $(date)" >> $L
