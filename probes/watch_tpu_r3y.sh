#!/usr/bin/env bash
# Poll TPU tunnel liveness; when it recovers, run the queued 1M-tri
# chunked scale probe (r3y). Liveness is probed in a subprocess with a
# hard timeout because jax.devices() HANGS while the tunnel is down
# (NOTES_ROUND4 landmine #3).
set -u
cd "$(dirname "$0")/.."
while true; do
  if timeout 45 python -c "import jax, jax.numpy as jnp, numpy as np; print(np.asarray(jnp.arange(4.).sum()))" >/dev/null 2>&1; then
    echo "tunnel live at $(date -u +%H:%M:%S)"
    echo "=== probe_r3y ==="
    timeout 2400 python probes/probe_r3y.py 2>&1 | grep -v WARNING
    echo "=== probe_r3y rc=$? ==="
    break
  fi
  echo "tunnel down at $(date -u +%H:%M:%S); retry in 300s"
  sleep 300
done
