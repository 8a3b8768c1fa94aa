#!/bin/bash
# Long-lived round-3 probe supervisor: outlives the bounded watcher loops.
# Waits for the original r3tuv/r3zy watchers to exit, then — if the probe
# chains never actually ran (platform still down when they gave up) —
# re-runs run_r3tuv.sh + run_r3zy_direct once the TPU tunnel returns.
# Bounded at ~24 h of 5-min liveness probes. Never kills anything.
set -u
cd /root/repo
for pidfile in /tmp/probe_r3tuv2.pid /tmp/probe_r3zy.pid; do
  pid=$(cat "$pidfile" 2>/dev/null || echo 0)
  while [ "$pid" != "0" ] && kill -0 "$pid" 2>/dev/null; do
    sleep 120
  done
done
tuv_done=$(grep -c "all probes done" /tmp/probe_r3tuv.log /tmp/probe_r3tuv2.log 2>/dev/null | awk -F: '{s+=$2} END {print s+0}')
# NB: grep -c prints "0" AND exits 1 on zero matches, so `|| echo 0` would
# yield the two-line string "0\n0" and break every -eq/-gt test below.
zy_done=$(grep -c "r3zy done" /tmp/probe_r3zy.log 2>/dev/null | head -n1)
zy_done=${zy_done:-0}
if [ "$tuv_done" -gt 0 ] && [ "$zy_done" -gt 0 ]; then
  echo "both chains already completed; supervisor exiting"
  exit 0
fi
n=0
while true; do
  n=$((n+1))
  if timeout 240 python -c "import jax; print('alive', jax.devices())" 2>/dev/null; then
    echo "TPU BACK (supervisor) after $n attempts: $(date -u)"
    break
  fi
  echo "supervisor wait $n $(date -u)"
  sleep 300
  if [ $n -ge 288 ]; then echo "supervisor giving up after ~24h"; exit 1; fi
done
if [ "$tuv_done" -eq 0 ]; then
  bash /root/repo/probes/run_r3tuv.sh >> /tmp/probe_r3tuv_sup.log 2>&1
fi
if [ "$zy_done" -eq 0 ]; then
  echo "=== r3z (fused kernels) ==="
  timeout 1800 python probes/probe_r3z.py
  echo "=== r3y (1M-tri chunked scale) ==="
  timeout 2400 python probes/probe_r3y.py
  echo "=== full bench ==="
  timeout 5400 python bench.py
  echo "=== r3zy done (supervisor) ==="
fi
