#!/bin/bash
# Chained TPU probes, cheapest/most-cached compiles first, new-kernel
# compiles LAST (axon compile-service protocol: a Mosaic crash wedges the
# service ~25 min, so suspects go last). Liveness-gated.
set -u
cd /root/repo
for i in 1 2 3 4 5; do
  timeout 300 python -c "import jax; print('alive', jax.devices())" && break
  echo "liveness attempt $i failed; sleeping 120s"
  sleep 120
done
echo "=== r3w (frame residual decomposition; all-cached kernel families) ==="
timeout 1500 python /root/repo/probes/probe_r3w.py
echo "=== r3u (collapse frontier modes x child ordering; cached kernels) ==="
timeout 1800 python /root/repo/probes/probe_r3u.py
echo "=== r3t (fused rebuild; NEW morton-codes kernel) ==="
timeout 1200 python /root/repo/probes/probe_r3t.py
echo "=== r3v (deferred z16 raster vs v2 vs ray; NEW raster16 kernel LAST) ==="
timeout 1800 python /root/repo/probes/probe_r3v.py
echo "=== all probes done ==="
