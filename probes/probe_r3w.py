"""Round-3 probe W: where do the ~13 ms of frame residual go?

frame[ray] (67 ms mid-round) minus full-consume G-buffer (45.7) minus the
standalone shadow trace (7.8) leaves ~13 ms unaccounted. Decompose:
  - shadow_production complete (raygen + exit-t cap + trace + reshape)
    vs the bare any-hit kernel
  - composite_pass alone
  - apply_textures alone (procedural scene: may be a no-op)
  - render_frame_fn total for the same cfg
All compiles are cached kernel families (no new Mosaic programs), so this
probe is safe to run first in a chain.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=32, batches=4):
    _force(fn())
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        _force(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tpurt.app import (gbuffer_production, render_frame_fn,
                           shadow_production)
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.passes.composite import composite_pass
    from tpurt.passes.shading import make_shade_table, make_shade_table_orig
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    cfg = RenderConfig(width=W, height=H, leaf_size=14, gbuffer="ray")
    sbvh = build_sah_lbvh(host_mesh, 14)
    wide = jax.device_put(build_wide(sbvh))  # host-sync count; not jittable
    wide = jax.jit(order_children_for_point)(wide, jnp.asarray(cam.position))
    st = jax.jit(make_shade_table)(sbvh, mesh)
    st_orig = jax.jit(make_shade_table_orig)(mesh)
    key = jax.random.PRNGKey(0)

    # 1. G-buffer production (full consume).
    gbf = jax.jit(lambda a, m, c, s, so: jax.tree.reduce(
        lambda x, y: x + y,
        jax.tree.map(lambda v: jnp.sum(v.astype(jnp.float32)),
                     gbuffer_production(a, m, c, cfg, s, so))))
    t = timed(lambda: gbf(wide, mesh, cam, st, st_orig), reps=16)
    log(f"gbuffer_production total: {t*1e3:.2f} ms")

    gbuf = jax.jit(lambda a, m, c, s, so: gbuffer_production(
        a, m, c, cfg, s, so))(wide, mesh, cam, st, st_orig)
    gbuf = jax.block_until_ready(gbuf)

    # 2. shadow_production complete (raygen + cap + trace + combine).
    shf = jax.jit(lambda a, g, k: jnp.sum(
        shadow_production(a, g, light, k, cfg)))
    t = timed(lambda: shf(wide, gbuf, key), reps=32)
    log(f"shadow_production total: {t*1e3:.2f} ms")

    # 3. composite alone.
    sh = jax.jit(lambda a, g, k: shadow_production(a, g, light, k, cfg))(
        wide, gbuf, key)
    sh = jax.block_until_ready(sh)
    cpf = jax.jit(lambda g, s: jnp.sum(
        composite_pass(g, s, light, cfg.ambient, cfg.background)))
    t = timed(lambda: cpf(gbuf, sh), reps=32)
    log(f"composite alone: {t*1e3:.2f} ms")

    # 4. full fused frame.
    fr = jax.jit(lambda a, m, c, k, s, so: jnp.sum(render_frame_fn(
        a, m, c, (light,), k, cfg, shade_table=s,
        shade_table_orig=so)["image"]))
    t = timed(lambda: fr(wide, mesh, cam, key, st, st_orig), reps=16)
    log(f"render_frame_fn total: {t*1e3:.2f} ms")
    log("probe_r3w done")


if __name__ == "__main__":
    main()
