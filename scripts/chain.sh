#!/bin/sh
# Generic chained launcher: wait for process $1 to exit, then exec the
# rest of the argv from the repo root. Replaces the one-off chain_*.sh
# wrappers (the TPU is exclusive: queue follow-up sweeps behind the
# running one instead of racing it).
#
# Usage: nohup sh scripts/chain.sh <pid> python -u scripts/sweep.py ... \
#            > /root/repo/.mysweep.log 2>&1 &
pid=$1
shift
while kill -0 "$pid" 2>/dev/null; do sleep 30; done
cd /root/repo || exit 1
exec "$@"
