#!/usr/bin/env bash
# Round-4 TPU probe queue. probe_r4e is EXCLUDED: its experimental
# (1,1)-slice variant fails Mosaic compilation, and a failed remote
# compile wedges the tunnel ~25 min (NOTES_ROUND3 #2) — it burned the
# first r4b slot this round. Decision probes first.
set -u
cd "$(dirname "$0")/.."
for p in probe_r4b probe_r4c probe_r4a probe_r3y; do
  echo "=== $p ==="
  timeout 2400 python "probes/$p.py" 2>&1 | grep -v WARNING
  echo "=== $p rc=$? ==="
done
