#!/usr/bin/env bash
# Round-4 TPU probe queue — run when the axon tunnel recovers.
# Order: cheapest/highest-leverage first, each fault-isolated with a
# hard timeout so one wedge cannot take the rest down.
set -u
cd "$(dirname "$0")/.."
for p in probe_r4e probe_r4b probe_r4c probe_r4a; do
  echo "=== $p ==="
  timeout 1800 python "probes/$p.py" 2>&1 | grep -v WARNING
  echo "=== $p rc=$? ==="
done
