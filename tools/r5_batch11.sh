#!/bin/bash
# Round-5 batch #11: 2D 490k regression bisect (verdict task 8).
# Fact: round-4 tip measured 72.5 steps/s; round-5 tip measures ~55 with
# ZERO band misses at the same bc=128 — so the banded-move sizing theory
# from batch 7 was wrong, and the suspects are the round-5 default flips
# and permute changes that were only ever A/B'd on the 3D 1M flagship:
#   77e9ee0  eager sort default (BENCH_LAZY_SORT=1 restores lazy)
#   77e9ee0  dense elementwise grid update (WGSPARKL_FOLD_VEL=1 restores)
#   c54f2d1  permute chunk 512 + first exc level 512 (PERM_CHUNK=256)
# Each knob isolated at config 2b; winners combined at the end.
set -u
cd /root/repo
L=/tmp/r5_batch11.log
echo "=== r5 batch11 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "2 lazy sort" env BENCH_LAZY_SORT=1 python tools/measure_configs.py 2
run "2 perm chunk 256" env WGSPARKL_PERM_CHUNK=256 python tools/measure_configs.py 2
run "2 fold_vel" env WGSPARKL_FOLD_VEL=1 python tools/measure_configs.py 2
# config 4b (512k) shows the same scale-class regression (46.7 vs
# round-4's 54.0 while 1M improved and 202.5k held) — same suspects.
run "4 lazy sort" env BENCH_LAZY_SORT=1 python tools/measure_configs.py 4
run "4 perm chunk 256" env WGSPARKL_PERM_CHUNK=256 python tools/measure_configs.py 4
run "4 fold_vel" env WGSPARKL_FOLD_VEL=1 python tools/measure_configs.py 4
run "4 bc128" env BENCH_BCHUNK=128 python tools/measure_configs.py 4
echo "=== r5 batch11 done $(date)" >> $L
