#!/bin/sh
# Regenerate the committed CPU compile-cache seed (tests/_compile_cache_seed/)
# from a cold fast-tier run. The seed makes a cold box's first `pytest -q`
# run at warm-cache speed; stale entries hash-miss harmlessly.
set -e
cd "$(dirname "$0")/.."
rm -rf /tmp/tpurt_jax_cache tests/_compile_cache_seed
python -m pytest tests/ -q
cp -r /tmp/tpurt_jax_cache tests/_compile_cache_seed
du -sh tests/_compile_cache_seed
echo "seed refreshed — commit tests/_compile_cache_seed"
