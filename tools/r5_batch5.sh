#!/bin/bash
# Round-5 batch #5 (auto-queued behind batch 4): TPU-scale rendered
# artifact — reference-scale sand3 (202.5k particles) on the real chip,
# PLY dumps every 10 frames, rendered to PNG/GIF locally afterwards.
set -u
cd /root/repo
L=/tmp/r5_batch5.log
while ! grep -q "r5 batch4 done" /tmp/r5_batch4.log 2>/dev/null; do
  sleep 60
done
echo "=== r5 batch5 start $(date)" >> $L
echo "--- sand3 TPU artifact run $(date)" >> $L
rm -rf /tmp/wgsparkl_frames_sand3
( cd examples && timeout 3600 env SCALE=1.0 FRAMES=120 PLY_EVERY=10 \
    python sand3.py >> $L 2>&1 )
echo "exit: $? $(date)" >> $L
echo "=== r5 batch5 done $(date)" >> $L
