#!/bin/sh
# Chained launcher: wait for the running r2-final sweep (PID $1) to exit,
# then launch the width-probe + fold sweep. Keeps the exclusive TPU busy
# with no dead time between sweeps. Hypothesis under test (SWEEPS.md):
# per-op VPU throughput at 1920-wide windows is ~58% of 4096-wide at equal
# window size. Configs 1-3 measure the lane-fold fix (zero + naive at the
# reference default, zero at 2048^2); configs 4-8 separate lane width /
# pow2 alignment / grid-block count / domain rows.
while kill -0 "$1" 2>/dev/null; do sleep 30; done
cd /root/repo || exit 1
exec python -u scripts/sweep.py --json '[
 {"shape":[1080,1920],"boundary":"zero","fold":2,"k":16,"resident":"off","steps":1024},
 {"shape":[1080,1920],"boundary":"naive","fold":2,"k":16,"resident":"off","steps":1024},
 {"shape":[2048,2048],"boundary":"zero","fold":2,"k":16,"resident":"off","steps":1024},
 {"shape":[4320,1920],"boundary":"zero","tr":544,"k":16,"resident":"off","steps":1024},
 {"shape":[2160,3840],"boundary":"zero","tr":256,"k":16,"resident":"off","steps":1024},
 {"shape":[1080,2048],"boundary":"zero","tr":544,"k":16,"resident":"off","steps":1024},
 {"shape":[1080,4096],"boundary":"zero","tr":216,"k":16,"resident":"off","steps":1024},
 {"shape":[1080,7680],"boundary":"zero","tr":120,"k":16,"resident":"off","steps":1024}
]' > /root/repo/.sweep_r2_width.log 2>&1
