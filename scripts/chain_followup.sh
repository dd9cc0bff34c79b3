#!/bin/sh
# Chained launcher: wait for the width-probe sweep (PID $1) to exit, then
# measure the round-2 per-call-overhead fixes (sanitize-on-load is now the
# backend default; resident unrolls up to 8 steps per fori iteration) at
# the production configs, including the 4096^2 headline guard (bench.py
# runs with sanitize at round end — a regression there must be caught
# here, not by the driver).
while kill -0 "$1" 2>/dev/null; do sleep 30; done
cd /root/repo || exit 1
exec python -u scripts/sweep.py --json '[
 {"shape":[1080,1920],"boundary":"zero","tr":544,"k":16,"resident":"off","steps":1024},
 {"shape":[1080,1920],"boundary":"zero","resident":"on","steps":1024},
 {"shape":[1080,1920],"boundary":"naive","resident":"on","steps":1024},
 {"shape":[1080,1920],"boundary":"naive","tr":360,"k":16,"resident":"off","steps":1024},
 {"shape":[4096,4096],"boundary":"zero","tr":256,"k":16,"resident":"off","steps":1024},
 {"shape":[4096,4096],"boundary":"naive","tr":256,"k":16,"resident":"off","steps":1024}
]' > /root/repo/.sweep_r2_followup.log 2>&1
