#!/bin/bash
# Round-5 batch #6 (auto-queued behind batch 5): permute-apply levers.
# The 34.7-defaults profile puts the re-sort bucket at ~5.6 ms/substep
# (sort 1.14 + XLA prep 1.89 + permute kernel 2.56): the kernel runs
# ~3915 sequential 256-lane programs (~1.2us/program overhead), so fewer
#+ wider programs may now WIN with the pure-shift class + small exc
# level (the old PERM_CHUNK A/Bs predate both).
set -u
cd /root/repo
L=/tmp/r5_batch6.log
while ! grep -q "r5 batch5 done" /tmp/r5_batch5.log 2>/dev/null; do
  sleep 60
done
echo "=== r5 batch6 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "HEAD exc-level-512 default" python bench.py
run "PERM_CHUNK=512" env WGSPARKL_PERM_CHUNK=512 python bench.py
run "PERM_CHUNK=1024" env WGSPARKL_PERM_CHUNK=1024 python bench.py

echo "=== r5 batch6 done $(date)" >> $L
