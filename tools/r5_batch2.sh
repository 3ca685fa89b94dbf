#!/bin/bash
# Round-5 batch #2: name the remaining ~2.8 ms/substep regression
# (19621ab 34.20 -> HEAD 31.18; bf7e582 ruled out — nc==0 path only).
# Decisive experiment: per-bucket profile diff HEAD vs 19621ab, plus
# knob-combination benches (fold_vel / eager_sort / full-permute).
set -u
cd /root/repo
L=/tmp/r5_batch2.log
W=/tmp/wt_probe
echo "=== r5 batch2 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "profile HEAD default" python tools/profile_bench.py
run "bench HEAD FOLD_VEL=0 EAGER=1" env WGSPARKL_FOLD_VEL=0 BENCH_EAGER_SORT=1 python bench.py
run "bench HEAD FOLD_VEL=0 EAGER=1 PERM_ROWS=0" env WGSPARKL_FOLD_VEL=0 BENCH_EAGER_SORT=1 WGSPARKL_PERM_ROWS=0 python bench.py

git -C /root/repo worktree remove --force $W 2>/dev/null
git -C /root/repo worktree add --detach -f $W 19621ab >> $L 2>&1
# 19621ab predates the by-source-bucket profiler — use HEAD's copy
cp tools/profile_bench.py $W/tools/profile_bench.py
echo "--- profile 19621ab $(date)" >> $L
( cd $W && timeout 3600 python tools/profile_bench.py >> $L 2>&1 )
echo "exit: $? $(date)" >> $L
git -C /root/repo worktree remove --force $W 2>/dev/null
echo "=== r5 batch2 done $(date)" >> $L
