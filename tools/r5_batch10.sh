#!/bin/bash
# Round-5 batch #10 (after batch 9's bc defaults are adopted):
#  1. numerics gate at the final defaults
#  2. 1M flagship bench at the final defaults (official record)
#  3. CDF-mode two-scene A/B (verdict round-4 task 7: show the auto
#     choice winning in BOTH directions)
#  4. 2D 490k per-bucket profile (task 8: name the 2D cost)
#  5. TPU-scale rendered artifact: ~1M sand3 frames -> PLY -> viewer PNG
set -u
cd /root/repo
L=/tmp/r5_batch10.log
echo "=== r5 batch10 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "numerics gate" python tools/check_tpu_numerics.py
run "1M flagship final defaults" python bench.py
run "cdf-mode two-scene A/B" python tools/ab_cdf_mode.py
run "2D 490k profile" env PROF_SCENE=sand2 python tools/profile_bench.py
run "1M profile at final defaults" python tools/profile_bench.py
run "1M sand3 frames" env SCALE=1.7 FRAMES=48 PLY_EVERY=8 \
    DUMP_DIR=/tmp/wgsparkl_frames_1m python examples/sand3.py
run "render artifact" python -m wgsparkl_tpu.viewer /tmp/wgsparkl_frames_1m \
    --out artifacts/sand3_1m_tpu_frames.png
echo "=== r5 batch10 done $(date)" >> $L
