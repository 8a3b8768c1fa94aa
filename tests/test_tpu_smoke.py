"""Opt-in TPU perf smoke test (SURVEY.md §4.6): asserts a Mrays/s floor on
real hardware. Skipped unless TPURT_TEST_TPU=1 (the CI suite runs on CPU).

Run: TPURT_TEST_TPU=1 python -m pytest tests/test_tpu_smoke.py -s
"""

import os
import time

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("TPURT_TEST_TPU"),
    reason="set TPURT_TEST_TPU=1 to run perf smoke on real TPU")


@requires_tpu
def test_shadow_throughput_floor():
    import jax
    import jax.numpy as jnp
    from tpurt.app import make_tracers
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
    cfg = RenderConfig(width=1920, height=1080, leaf_size=14)
    mesh = jax.device_put(sponza_scene(260_000))
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    bvh = build_lbvh(mesh.vertices, mesh.indices, leaf_size=14)
    wide = build_wide(bvh)
    _, trace_any = make_tracers(cfg)
    gb = jax.jit(lambda a, m, c: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d), m, c, 1920, 1080))
    gbuf = gb(wide, mesh, cam)
    so, sd, stm = jax.jit(lambda g, l: shadow_ray_batch(
        g, l, cfg.shadow_bias, None))(gbuf, light)
    # Scalar-fused timing (a naked forced sync costs ~30 ms of tunnel
    # latency on this platform; see bench.py timed()).
    shade = jax.jit(lambda a, o, d, t: jnp.sum(
        trace_any(a, o, d, t).astype(jnp.int32)))
    float(shade(wide, so, sd, stm))  # warm + force
    t0 = time.perf_counter()
    for _ in range(40):
        occ = shade(wide, so, sd, stm)
    float(occ)
    dt = (time.perf_counter() - t0) / 40
    valid = int(np.asarray(gbuf["valid"]).sum())
    mrays = valid / dt / 1e6
    print(f"\nTPU shadow throughput: {mrays:.1f} Mrays/s")
    # Morton-tree throughput measured ~100 Mrays/s with the honest timing
    # protocol (round 2); the floor is ratcheted to 80 so a real regression
    # fails while ~20% tunnel variance still passes.
    assert mrays > 80.0
