#!/bin/bash
# Replica-suite driver with process recycling: the suite exits rc=3 when
# host RSS crosses --max-rss-gb (axon h2d leak, PERF.md round 4) and this
# loop relaunches it; resume = skip-existing logs. All args pass through.
set -u
cd /root/repo
# survive a lost editable install (round-4 env reset): the package
# imports from the repo root regardless of pip state
export PYTHONPATH="/root/repo${PYTHONPATH:+:$PYTHONPATH}"
rc=3
n=0
while [ "$rc" -eq 3 ] && [ "$n" -lt 20 ]; do
  n=$((n + 1))
  echo "=== suite launch #$n $(date -u +%H:%M:%S)"
  python scripts/run_replica_suite.py "$@"
  rc=$?
  echo "=== suite exit rc=$rc"
done
exit "$rc"
