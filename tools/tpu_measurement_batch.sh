#!/bin/bash
# Measurement batch for when the axon TPU tunnel revives.
# Sequential; each phase logs to /tmp/tpu_batch.log.
cd /root/repo
L=/tmp/tpu_batch.log
echo "=== batch start $(date)" >> $L

echo "--- phase 1: numerics gate $(date)" >> $L
timeout 3600 python tools/check_tpu_numerics.py >> $L 2>&1
echo "numerics exit: $?" >> $L

echo "--- phase 2: bench default (highest) $(date)" >> $L
timeout 3600 python bench.py >> $L 2>&1
echo "bench exit: $?" >> $L

echo "--- phase 3: bench WGSPARKL_PHYS_DOT=x3 $(date)" >> $L
WGSPARKL_PHYS_DOT=x3 timeout 3600 python bench.py >> $L 2>&1
echo "bench x3 exit: $?" >> $L

echo "--- phase 3b: bench BENCH_EAGER_SORT=1 $(date)" >> $L
BENCH_EAGER_SORT=1 timeout 3600 python bench.py >> $L 2>&1
echo "bench eager exit: $?" >> $L

echo "--- phase 4: profile (bench config) $(date)" >> $L
timeout 3000 python /tmp/prof1m_r3.py > /tmp/prof1m_r3.out 2>&1
echo "profile exit: $? (see /tmp/prof1m_r3.out)" >> $L

echo "--- phase 5: bench BENCH_SPARSE=1 $(date)" >> $L
BENCH_SPARSE=1 timeout 3600 python bench.py >> $L 2>&1
echo "bench sparse exit: $?" >> $L

git add BENCH_HISTORY.jsonl && \
  git commit -q -m "record TPU bench history entries from the post-outage measurement batch" >> $L 2>&1

echo "=== batch done $(date)" >> $L
