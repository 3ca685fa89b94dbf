#!/bin/bash
# Round-5 batch #12: 2D 490k regression — geometry/permute-payload A/Bs
# (the batch-11 knob bisect cleared eager-sort/perm-chunk/fold-vel).
#   a. BENCH_BAND=2048 BENCH_BCHUNK=128: replicate the round-4 banded-move
#      geometry exactly (static 2048 band, 128-job chunks)
#   b. WGSPARKL_PERM_ROWS=40: restore the round-4 prefix permute (2D
#      moves rows [0,24) and recomputes the tail; default 0 = full)
#   c. combo of (a)+(b) = the full round-4 re-sort/move configuration
set -u
cd /root/repo
L=/tmp/r5_batch12.log
echo "=== r5 batch12 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "2 old band geom" env BENCH_BAND=2048 BENCH_BCHUNK=128 python tools/measure_configs.py 2
run "2 prefix permute" env WGSPARKL_PERM_ROWS=40 python tools/measure_configs.py 2
run "2 old band + prefix" env BENCH_BAND=2048 BENCH_BCHUNK=128 WGSPARKL_PERM_ROWS=40 python tools/measure_configs.py 2
echo "=== r5 batch12 done $(date)" >> $L
