#!/bin/bash
# Measurement batch for when the axon TPU tunnel revives (round 4).
# Sequential; each phase logs to /tmp/tpu_batch.log.  Order: validate
# numerics first, then the flagship bench (validates the round-3
# unmeasured batch on real Mosaic), then one A/B per knob, then profile.
cd /root/repo
L=/tmp/tpu_batch.log
echo "=== batch start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "phase 1: numerics gate" python tools/check_tpu_numerics.py
run "phase 2: bench default" python bench.py
run "phase 3: bench WGSPARKL_PHYS_DOT=x3" env WGSPARKL_PHYS_DOT=x3 python bench.py
run "phase 4: bench WGSPARKL_PERM_CHUNK=1024" env WGSPARKL_PERM_CHUNK=1024 python bench.py
run "phase 4b: bench WGSPARKL_PERM_CHUNK=512" env WGSPARKL_PERM_CHUNK=512 python bench.py
run "phase 5: bench BENCH_EAGER_SORT=1" env BENCH_EAGER_SORT=1 python bench.py
run "phase 5b: bench BENCH_BCHUNK=512" env BENCH_BCHUNK=512 python bench.py
run "phase 6: profile (bench config)" python tools/profile_bench.py
run "phase 7: bench BENCH_SPARSE=1" env BENCH_SPARSE=1 python bench.py
run "phase 8: configs 2-5" python tools/measure_configs.py

git add BENCH_HISTORY.jsonl && \
  git commit -q -m "record TPU bench history entries from the round-4 measurement batch" >> $L 2>&1

echo "=== batch done $(date)" >> $L
