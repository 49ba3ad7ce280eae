#!/bin/bash
# Healthy-tunnel window playbook (round 5): run the full device measurement
# queue, each step bounded, everything logged. Launch in the background the
# moment scripts/probe_link.py reports the protocol floor (h2d>100,
# d2h>30 MB/s); results land in /tmp/device_window_<ts>.log.
#
# Round-5 queue: MXU-histogram A/B (aeebef3), merge substage attribution,
# byte-exactness on chip, then — d2h permitting — the e2e jax_restart row
# (VERDICT r4 item 3) and the inflight-depth x band-height sweep (item 8).
#
# Usage: bash scripts/run_device_window.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/device_window_$(date +%H%M%S).log}"
exec >"$LOG" 2>&1
echo "== device window queue start: $(date -u) =="

echo "== 0. link probe =="
timeout 180 python scripts/probe_link.py || echo "probe degraded/failed (rc=$?)"

echo "== 1. warm cache =="
timeout 1200 python scripts/warm_tpu_cache.py

echo "== 2. MXU hist/scatter A/B (pallas pack on, alternated) =="
for pass in 1 2; do
  for cfg in "1 1" "1 0" "0 0"; do
    set -- $cfg
    echo "-- pass $pass MXU_HIST=$1 MXU_SCATTER=$2 --"
    STITCH_TPU_PALLAS=1 STITCH_TPU_MXU_HIST=$1 STITCH_TPU_MXU_SCATTER=$2 \
      TIME_JSON=1 timeout 600 python scripts/time_device_groups.py 512 8192 5
  done
done

echo "== 3. merge substages (best MXU config, pallas on) =="
STITCH_TPU_PALLAS=1 timeout 900 python scripts/profile_merge_substages.py || echo "rc=$?"
echo "== 3b. full stage profile =="
STITCH_TPU_PALLAS=1 timeout 900 python scripts/profile_device_stages.py 512 8192 4 || echo "rc=$?"

echo "== 4. byte-exactness on the real chip (MXU paths default-on) =="
STITCH_TPU_PALLAS=1 timeout 900 python scripts/validate_device_jpeg.py || echo "validate rc=$?"

echo "== 5. e2e jax_restart row (needs d2h >= 30 MB/s) =="
BENCH_BACKEND=jax BENCH_RESTART=1 BENCH_REPS=1 timeout 900 python bench.py || echo "e2e rc=$?"

echo "== 6. inflight-depth x band-height sweep (e2e device path) =="
for depth in 1 2 4; do
  for band in 256 512 1024; do
    echo "-- INFLIGHT=$depth BAND=$band --"
    STITCH_TPU_INFLIGHT=$depth BENCH_BAND=$band BENCH_BACKEND=jax \
      BENCH_RESTART=1 BENCH_REPS=1 timeout 600 python bench.py || echo "rc=$?"
  done
done

echo "== 7. decode tier: output-format sweep (r5-s4 question) =="
timeout 2400 python scripts/sweep_device_decode.py rgb planar packed || echo "rc=$?"
echo "== 7b. decode tier: checksummed stage attribution =="
timeout 2400 python scripts/profile_decode_checksum.py 512 8192 32 || echo "rc=$?"
echo "== 7c. decode row refresh =="
TIME_JSON=1 timeout 900 python scripts/time_device_decode.py 512 8192 32 3 || echo "rc=$?"

echo "== 8. link probe again (window still healthy?) =="
timeout 180 python scripts/probe_link.py || echo "probe degraded/failed (rc=$?)"
echo "== queue done: $(date -u) =="
