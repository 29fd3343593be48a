#!/bin/bash
# Round-4 post-bench probe queue: serialized TPU work, one process at a
# time (single chip, single host core). Each probe is independently
# timeout-guarded; a failure does not stop the queue.
set -u
cd /root/repo
R=results/v5e_r4
mkdir -p "$R"

echo "=== probe_tier_calibration $(date -u +%H:%M:%S)"
timeout 2400 python scripts/probe_tier_calibration.py \
  --out $R/tier_calibration.json --top 8 \
  > $R/tier_calibration.log 2>&1
echo "rc=$? tier_calibration"

echo "=== probe_k32_anomaly $(date -u +%H:%M:%S)"
timeout 1500 python scripts/probe_k32_anomaly.py $R/k32_anomaly_tiers.json \
  > $R/k32_anomaly.log 2>&1
echo "rc=$? k32_anomaly"

echo "=== probe_fused_gathered $(date -u +%H:%M:%S)"
timeout 1500 python scripts/probe_fused_gathered.py \
  > $R/fused_gathered.log 2>&1
echo "rc=$? fused_gathered"

echo "=== probe_batched_smallk $(date -u +%H:%M:%S)"
timeout 1800 python scripts/probe_batched_smallk.py \
  --out $R/batched_smallk.json > $R/batched_smallk.log 2>&1
echo "rc=$? batched_smallk"

echo "=== check_autotune $(date -u +%H:%M:%S)"
timeout 1200 python scripts/check_autotune.py $R/bench_fullgrid.log \
  --auto-alpha --out $R/check_autotune.json \
  > $R/check_autotune.log 2>&1
echo "rc=$? check_autotune"

echo "=== queue done $(date -u +%H:%M:%S)"
