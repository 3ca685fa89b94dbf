#!/bin/bash
# Round-5 batch #8: per-chunk two-level banded moves (6f45f33).
#  1. numerics gate (scatter reassociation is roundoff-class; gate must
#     hold dpos = 0.0 — the gate scene's shared-node sums ride P2G which
#     was already roundoff-class vs CPU... verify)
#  2. 1M flagship — expect ~35.4 (moves were already all-banded there)
#  3. config 3 dam break — the target: splash outlier chunks no longer
#     drag whole substeps onto full matmuls (was 40.49 @ band_miss 20/20)
#  4. config 2 2D — narrow dense-common band (208/448 vs 5872): recover
#     >= 72.5, hopefully beat it (octant stacking + narrower slab)
set -u
cd /root/repo
L=/tmp/r5_batch8.log
echo "=== r5 batch8 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "numerics gate" python tools/check_tpu_numerics.py
run "1M flagship per-chunk" python bench.py
run "config 3 dam break per-chunk" python tools/measure_configs.py 3
run "config 2 2D narrow band" python tools/measure_configs.py 2
echo "=== r5 batch8 done $(date)" >> $L
