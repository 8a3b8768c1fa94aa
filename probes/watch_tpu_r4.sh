#!/usr/bin/env bash
# Poll TPU tunnel liveness; on recovery run the queued round-4 probes:
# r3y (1M-tri chunked scale row — proven kernel families) first, then
# r4h (w8t attr G-buffer — contains ONE NEW Mosaic kernel compile, so it
# goes LAST: a failed remote compile wedges the helper ~25 min).
# Liveness probed in a subprocess with a hard timeout: jax.devices()
# HANGS while the tunnel is down (NOTES_ROUND4 landmine #3).
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 45 python -c "import jax, jax.numpy as jnp, numpy as np; print(np.asarray(jnp.arange(4.).sum()))" >/dev/null 2>&1; then
    echo "tunnel live at $(date -u +%H:%M:%S)"
    for p in probe_r3y probe_r4h; do
      echo "=== $p ==="
      timeout 2400 python "probes/$p.py" 2>&1 | grep -v WARNING
      echo "=== $p rc=$? ==="
    done
    break
  fi
  echo "tunnel down at $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
