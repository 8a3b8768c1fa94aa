"""Round-3 probe AB: the zero-gather FUSED frame matrix on TPU.

With attr tracking in phase 1 (probe r3aa: G-buffer 13.5 vs 27.0 ms),
the fused primary+shadow kernels should finally beat the unfused frame:
the unfused attr frame still pays shadow raygen + packet re-layout + a
second dispatch; the fused one pays ~nothing extra. Measures, at Sponza
1080p on one chip:
  1. unfused attr frame (1 hard directional light)
  2. FUSED attr frame (same light)
  3. unfused attr frame, soft sun spp=8 (config 3)
  4. FUSED soft attr frame, spp=8
  5. FUSED multi attr frame (2 hard lights) vs unfused

NEW-KERNEL COMPILES (the attr variants of the fused kernels) — run
standalone.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, iters=20):
    fn()
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(r).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpurt.app import render_frame_fn
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.passes.shading import make_leaf_attr_rows, make_shade_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    host_mesh = sponza_scene()
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    bvh = build_sah_lbvh(host_mesh, 14)
    wide = jax.device_put(build_wide(bvh))
    st = jax.device_put(jax.jit(make_shade_table)(bvh, mesh))
    at = jax.jit(make_leaf_attr_rows)(bvh, mesh)
    at = (jax.device_put(at[0]), jax.device_put(at[1]))
    log(f"tris={host_mesh.indices.shape[0]}")
    key = jax.random.PRNGKey(0)
    l1 = Light.directional((0.25, 0.9, 0.2))
    l2 = Light.directional((-0.4, 0.8, -0.3), color=(0.7, 0.8, 1.0),
                           intensity=0.5)
    sun = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)
    W, H = 1920, 1080

    def frame(cfg, lights, use_at, a, s):
        f = jax.jit(lambda a_, st_, at_: jnp.sum(render_frame_fn(
            a_, mesh, cam, lights, key, cfg, shade_table=st_,
            attr_tables=at_)["image"]))
        return timed(lambda: f(a, s, at if use_at else None))

    cfg_u = RenderConfig(width=W, height=H, leaf_size=14, gbuffer="ray")
    cfg_f = RenderConfig(width=W, height=H, leaf_size=14, gbuffer="ray",
                         fused_shadow=True)
    cfg_us = RenderConfig(width=W, height=H, leaf_size=14, gbuffer="ray",
                          spp=8)
    cfg_fs = RenderConfig(width=W, height=H, leaf_size=14, gbuffer="ray",
                          spp=8, fused_shadow=True)

    # Cached/old families first, new attr-fused compiles after.
    log(f"frame unfused attr (1 dir light): {frame(cfg_u, (l1,), True, wide, st):.2f} ms")
    log(f"frame unfused attr soft spp=8:    {frame(cfg_us, (sun,), True, wide, st):.2f} ms")
    t0 = time.perf_counter()
    v = frame(cfg_f, (l1,), True, wide, st)
    log(f"frame FUSED attr (1 dir light):   {v:.2f} ms "
        f"(first call incl compile {time.perf_counter()-t0:.0f}s)")
    log(f"frame FUSED attr (2 hard lights): {frame(cfg_f, (l1, l2), True, wide, st):.2f} ms")
    log(f"frame unfused attr (2 lights):    {frame(cfg_u, (l1, l2), True, wide, st):.2f} ms")
    log(f"frame FUSED attr soft spp=8:      {frame(cfg_fs, (sun,), True, wide, st):.2f} ms")
    log("probe_r3ab done")


if __name__ == "__main__":
    main()
