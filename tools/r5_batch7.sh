#!/bin/bash
# Round-5 batch #7: validate the thin-aware banded-move sizing (2922303).
#  1. numerics gate — still-body pose freeze + band change must keep
#     dpos = 0.0 exactly
#  2. 1M flagship — new band W2 1288 (was 1408), expect >= 35.38
#  3. config 3 dam break — the fix target: band_miss fallback was ~15 of
#     25 ms/substep; expect a large win over 38.2 (by=8 group=1024)
#  4. config 2 (2D 65k + 490k) — the band formula now applies to 2D
set -u
cd /root/repo
L=/tmp/r5_batch7.log
echo "=== r5 batch7 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "numerics gate" python tools/check_tpu_numerics.py
run "1M flagship, thin-aware band" python bench.py
run "config 3 dam break (band fix)" python tools/measure_configs.py 3
run "config 2 2D" python tools/measure_configs.py 2
echo "=== r5 batch7 done $(date)" >> $L
