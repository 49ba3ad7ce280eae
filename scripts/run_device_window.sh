#!/bin/bash
# Healthy-tunnel window playbook: run the full device measurement queue,
# each step bounded, everything logged. Launch in the background the
# moment scripts/probe_link.py reports the protocol floor (h2d>100,
# d2h>30 MB/s); results land in /tmp/device_window_<ts>.log.
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

echo "== 2. merge-mode sweep (interleaved) =="
SWEEP_VARIANTS="12:24:gather,12:24:hybrid,12:24:segsum,12:24:gather:2,12:16:hybrid" \
  timeout 1200 python scripts/sweep_device_params.py 4

echo "== 3. stage profile (gather) =="
timeout 900 python scripts/profile_device_stages.py 512 8192 4
echo "== 3b. stage profile (hybrid) =="
TIME_MERGE=hybrid timeout 900 python scripts/profile_device_stages.py 512 8192 4

echo "== 4. headline device-side marginal (segsum + hybrid) =="
TIME_JSON=1 timeout 600 python scripts/time_device_groups.py 512 8192 5
TIME_JSON=1 TIME_MERGE=hybrid timeout 600 python scripts/time_device_groups.py 512 8192 5

echo "== 5. byte-exactness on the real chip =="
timeout 900 python scripts/validate_device_jpeg.py || echo "validate rc=$?"

echo "== 6. link probe again (window still healthy?) =="
timeout 180 python scripts/probe_link.py || echo "probe degraded/failed (rc=$?)"
echo "== queue done: $(date -u) =="
