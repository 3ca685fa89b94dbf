#!/bin/bash
# Round-5 batch #4 (auto-queued behind batch 3): config-3 gap profile.
set -u
cd /root/repo
L=/tmp/r5_batch4.log
# wait for batch 3 to release the TPU
while ! grep -q "r5 batch3 done" /tmp/r5_batch3.log 2>/dev/null; do
  sleep 60
done
echo "=== r5 batch4 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3600 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

run "profile dam3 (config 3, by=8 group=1024)" env PROF_SCENE=dam3 python tools/profile_bench.py

echo "=== r5 batch4 done $(date)" >> $L
