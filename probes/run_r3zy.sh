#!/bin/bash
# Post-chain TPU sequence: waits for the r3tuv chain process to exit, then
# runs the fused-kernel probe (NEW Mosaic compiles last in its own file),
# the 1M-tri scale probe, and a full bench. Liveness-gated so a still-down
# platform produces log lines, not hangs.
set -u
cd /root/repo
chain_pid=$(cat /tmp/probe_r3tuv2.pid 2>/dev/null || echo 0)
while [ "$chain_pid" != "0" ] && kill -0 "$chain_pid" 2>/dev/null; do
  sleep 60
done
alive=0
for i in $(seq 1 10); do
  if timeout 300 python -c "import jax; print('alive', jax.devices())"; then
    alive=1; break
  fi
  echo "liveness attempt $i failed; sleeping 120s"
  sleep 120
done
if [ "$alive" != "1" ]; then
  echo "platform still down; aborting r3zy sequence"
  exit 1
fi
echo "=== r3z (fused primary+shadow kernels; new compiles last) ==="
timeout 1800 python probes/probe_r3z.py
echo "=== r3y (1M-tri chunked scale) ==="
timeout 2400 python probes/probe_r3y.py
echo "=== full bench ==="
timeout 5400 python bench.py
echo "=== r3zy done ==="
