#!/bin/bash
# Tunnel watcher (round 5): poll chip liveness; when the chip answers, run
# the decode measurement queue (device-resident protocol — works on any
# link where scalar fetches complete); when the FULL probe is healthy
# (h2d>100, d2h>30), run the whole window playbook including the e2e row.
#
# Usage: bash scripts/watch_device_window.sh [max_rounds] [sleep_s]
# Logs: /tmp/device_watch.log (+ per-queue logs it mentions).
set -u
cd "$(dirname "$0")/.."
MAX=${1:-40}
SLEEP=${2:-600}
LOG=/tmp/device_watch.log
exec >>"$LOG" 2>&1

decode_queue_done=0
for round in $(seq 1 "$MAX"); do
  echo "== watch round $round: $(date -u) =="
  # Chip liveness: one tiny program + dependent scalar fetch, hard bound.
  if timeout 240 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
x = jnp.arange(8, dtype=jnp.int32)
print("live:", int(np.asarray((x * 2).sum())))
EOF
  then
    echo "chip answers"
    if [ "$decode_queue_done" = 0 ]; then
      echo "-- decode queue start: $(date -u)"
      Q=/tmp/decode_queue_$(date +%H%M%S).log
      {
        timeout 3000 python scripts/sweep_device_decode.py rgb planar packed
        timeout 2400 python scripts/profile_decode_checksum.py 512 8192 32
      } >"$Q" 2>&1
      echo "-- decode queue done (rc=$?), log: $Q"
      grep -E "ms/band|cum" "$Q" | tail -20
      # Only mark done if the sweep actually produced numbers.
      if grep -q "ms/band" "$Q"; then decode_queue_done=1; fi
    fi
    # Full-health check for the e2e queue.
    PROBE=$(timeout 300 python scripts/probe_link.py 2>/dev/null | tail -1)
    echo "probe: $PROBE"
    H2D=$(echo "$PROBE" | sed -n 's/^h2d \([0-9.]*\) MB\/s.*/\1/p')
    D2H=$(echo "$PROBE" | sed -n 's/.*d2h \([0-9.]*\) MB\/s.*/\1/p')
    if [ -n "$H2D" ] && [ -n "$D2H" ] && \
       awk "BEGIN{exit !($H2D>100 && $D2H>30)}"; then
      echo "HEALTHY window — running full playbook"
      bash scripts/run_device_window.sh "/tmp/device_window_$(date +%H%M%S).log"
      echo "playbook done: $(date -u)"
      exit 0
    fi
  else
    echo "chip dead/hung (rc=$?)"
  fi
  sleep "$SLEEP"
done
echo "watcher exhausted $MAX rounds: $(date -u)"
