"""Benchmark: Sponza-class 1080p hard shadows on one TPU chip.

Measures the BASELINE.json headline metric — shadow-ray throughput
(Mrays/s/chip) — plus full-frame ms (LBVH build + G-buffer + shadow +
composite). Prints exactly ONE JSON line on stdout; diagnostics go to
stderr.

vs_baseline is value / 100 Mrays/s (the driver-set target; the reference
publishes no numbers — see BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_once(use_pallas: bool, leaf_size: int, width: int, height: int,
               tris: int):
    import jax
    import jax.numpy as jnp
    from tpurt.app import make_tracers, render_frame_fn
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.camera import generate_rays
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    cfg = RenderConfig(width=width, height=height, use_pallas=use_pallas,
                       leaf_size=leaf_size)
    mesh = jax.device_put(sponza_scene(tris))
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    log(f"scene tris={mesh.num_triangles} {width}x{height} "
        f"pallas={use_pallas} leaf={leaf_size}")

    build = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=leaf_size))
    bvh = jax.block_until_ready(build(mesh.vertices, mesh.indices))

    trace_closest, trace_any = make_tracers(cfg)
    gb = jax.jit(lambda bvh, mesh, cam: gbuffer_pass(
        lambda o, d: trace_closest(bvh, o, d), mesh, cam, width, height))
    gbuf = jax.block_until_ready(gb(bvh, mesh, cam))
    valid = int(np.asarray(gbuf["valid"]).sum())
    log(f"gbuffer valid px: {valid}/{width*height}")

    shadow_rays = jax.jit(lambda gbuf, light: shadow_ray_batch(
        gbuf, light, cfg.shadow_bias, None))
    so, sd, stm = jax.block_until_ready(shadow_rays(gbuf, light))
    shade = jax.jit(lambda bvh, o, d, tm: trace_any(bvh, o, d, tm))

    # Warm up + time the shadow trace alone (the BASELINE metric).
    occ = jax.block_until_ready(shade(bvh, so, sd, stm))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        occ = shade(bvh, so, sd, stm)
    jax.block_until_ready(occ)
    shadow_s = (time.perf_counter() - t0) / reps
    mrays = valid / shadow_s / 1e6
    log(f"shadow trace: {shadow_s*1e3:.2f} ms -> {mrays:.1f} Mrays/s "
        f"(occluded {int(np.asarray(occ).sum())})")

    # Full frame: per-frame rebuild + all passes (config 2).
    def frame(v, i, mesh, cam, lights, key):
        bvh = build_lbvh(v, i, leaf_size=leaf_size)
        return render_frame_fn(bvh, mesh, cam, lights, key, cfg)["image"]

    frame = jax.jit(frame)
    key = jax.random.PRNGKey(0)
    img = jax.block_until_ready(frame(mesh.vertices, mesh.indices, mesh, cam,
                                      (light,), key))
    t0 = time.perf_counter()
    for _ in range(5):
        img = frame(mesh.vertices, mesh.indices, mesh, cam, (light,), key)
    jax.block_until_ready(img)
    frame_ms = (time.perf_counter() - t0) / 5 * 1e3

    # Build alone.
    t0 = time.perf_counter()
    for _ in range(5):
        b2 = build(mesh.vertices, mesh.indices)
    jax.block_until_ready(b2)
    build_ms = (time.perf_counter() - t0) / 5 * 1e3
    log(f"frame (rebuild+trace+composite): {frame_ms:.2f} ms; "
        f"build alone: {build_ms:.2f} ms")
    return mrays, frame_ms, build_ms


def main() -> int:
    result = None
    for attempt, kw in enumerate([
        dict(use_pallas=True, leaf_size=14, width=1920, height=1080,
             tris=260_000),
        dict(use_pallas=True, leaf_size=14, width=1920, height=1080,
             tris=120_000),
        dict(use_pallas=False, leaf_size=4, width=960, height=540,
             tris=60_000),
    ]):
        try:
            mrays, frame_ms, build_ms = bench_once(**kw)
            result = dict(kw=kw, mrays=mrays, frame_ms=frame_ms,
                          build_ms=build_ms)
            break
        except Exception as e:  # noqa: BLE001 - report and try fallback
            log(f"bench attempt {attempt} failed: {type(e).__name__}: "
                f"{str(e)[:300]}")
    if result is None:
        print(json.dumps({"metric": "shadow_mrays_per_s", "value": 0.0,
                          "unit": "Mrays/s", "vs_baseline": 0.0}))
        return 1
    print(json.dumps({
        "metric": "shadow_mrays_per_s",
        "value": round(result["mrays"], 2),
        "unit": "Mrays/s",
        "vs_baseline": round(result["mrays"] / 100.0, 3),
        "frame_ms_sponza1080p_rebuild": round(result["frame_ms"], 2),
        "lbvh_build_ms": round(result["build_ms"], 2),
        "config": result["kw"],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
