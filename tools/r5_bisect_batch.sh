#!/bin/bash
# Round-5 bisection batch #1 (relaunched after the machine restart lost the
# first attempt's probes; its two HEAD runs survive in BENCH_HISTORY:
# default 31.13 @ ts 1787177713, FOLD_VEL=0 31.68 @ 1787178398).
#
# Locates the 3.3 ms/substep regression between beec347 (34.24 steps/s
# control, re-confirmed round 4) and e051fd5+CHAN_FREE=0 (30.72).
# Post-e051fd5 commits measured 30.9-32.2 (BENCH_HISTORY tail), so the
# numerics fix (59d03a3) and mstack (69d81be) are NOT the regression.
# Probes run in a detached worktree sharing /root/repo/.jax_cache.
# Logs to /tmp/r5_batch1.log with knob labels.
set -u
cd /root/repo
L=/tmp/r5_batch1.log
W=/tmp/wt_probe
echo "=== r5 batch1 start $(date)" >> $L

run() {
  echo "--- $1 $(date)" >> $L
  shift
  timeout 3000 "$@" >> $L 2>&1
  echo "exit: $? $(date)" >> $L
}

probe() {  # probe <label> <sha> [env VAR=V ...]
  local label="$1" sha="$2"; shift 2
  git -C /root/repo worktree remove --force $W 2>/dev/null
  git -C /root/repo worktree add --detach -f $W "$sha" >> $L 2>&1
  echo "--- probe $label @ $sha $(date)" >> $L
  ( cd $W && timeout 3000 env "$@" python bench.py >> $L 2>&1 )
  echo "exit: $? $(date)" >> $L
}

# 1: HEAD default — b5edf5f's pure-shift permute class is un-benched
run "HEAD b5edf5f default" python bench.py
# 2: permute microbench (informs the re-sort redesign running in parallel)
run "perm_microbench" python tools/perm_microbench.py

# 3-6: walk the suspect range (oldest first). beec347 = 34.24 (known).
probe "stencil+phys_dot" d524eb5 WGSPARKL_DUMMY=0
probe "in-kernel moving CDF" 19621ab WGSPARKL_DUMMY=0
probe "chan-free tree, gathered mode (fold forced on)" fd08cdf WGSPARKL_CHAN_FREE=0
probe "permute-skip" 5503470 WGSPARKL_CHAN_FREE=0

# 7: confirm the EAGER_SORT win on HEAD (round-4: 31.7 vs 30.7 pre-fix)
run "HEAD EAGER_SORT=1" env BENCH_EAGER_SORT=1 python bench.py

git -C /root/repo worktree remove --force $W 2>/dev/null
echo "=== r5 batch1 done $(date)" >> $L
