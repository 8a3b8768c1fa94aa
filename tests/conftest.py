"""Test configuration: force CPU JAX with a fake 8-device mesh.

This is the standard JAX trick for testing multi-chip sharding without a pod
(SURVEY.md §4.5): --xla_force_host_platform_device_count=8 gives shard_map a
real 8-device mesh on the host. Must run before jax is imported anywhere.
"""

import os

# Force CPU even if the session env preselects the TPU platform (the bench
# harness keeps JAX_PLATFORMS=axon; unit tests must be hermetic + fast).
# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var — so we must
# override the config explicitly after importing jax.
# Set TPURT_TEST_TPU=1 to run the opt-in TPU perf smoke tests on hardware.
_FORCE_CPU = not os.environ.get("TPURT_TEST_TPU")
if _FORCE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_CHECKS", "true")

import jax

if _FORCE_CPU:
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound (one big fused frame
# program per RenderConfig), so reruns go from ~8 min to seconds. A cold box
# is seeded from the committed snapshot (tests/_compile_cache_seed/ —
# regenerate with tests/refresh_compile_cache.sh); stale entries simply miss
# on their hash and recompile, so the seed can never poison a run.
_CACHE_DIR = "/tmp/tpurt_jax_cache"
_SEED_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_compile_cache_seed")
if _FORCE_CPU and not os.path.isdir(_CACHE_DIR) and os.path.isdir(_SEED_DIR):
    import shutil
    try:
        shutil.copytree(_SEED_DIR, _CACHE_DIR)
    except OSError:
        pass
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
