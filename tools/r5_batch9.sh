#!/bin/bash
# Round-5 batch #9: outer-cond two-level moves (c44ce98) + band_chunk A/B.
# Facts so far: per-chunk INNER conds cost ~20us each (1M 35.4 -> 32.0);
# dam with per-chunk = 55.88 (from 40.49); 2D 490k still 51.5 (was 72.5
# at bc=128) with ZERO misses -> scan-iteration overhead at bc=32.
set -u
cd /root/repo
L=/tmp/r5_batch9.log
echo "=== r5 batch9 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

# 1M flagship: outer-cond restore + bc A/B (band scales with bc)
run "1M default bc32 outer-cond" python bench.py
run "1M BCHUNK=64" env BENCH_BCHUNK=64 python bench.py
run "1M BCHUNK=128" env BENCH_BCHUNK=128 python bench.py
# dam break: outer-cond state + bc A/B
run "config3 default bc32 outer-cond" python tools/measure_configs.py 3
run "config3 BCHUNK=64" env BENCH_BCHUNK=64 python tools/measure_configs.py 3
# 2D: bc A/B at the narrow band formula
run "config2 BCHUNK=128" env BENCH_BCHUNK=128 python tools/measure_configs.py 2
run "config2 BCHUNK=64" env BENCH_BCHUNK=64 python tools/measure_configs.py 2
# config 4 (sand 202.5k / 512k) at the new defaults
run "config4 default" python tools/measure_configs.py 4
echo "=== r5 batch9 done $(date)" >> $L
