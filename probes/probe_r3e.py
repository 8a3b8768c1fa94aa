"""Chained round-3 TPU probe: feasibility (SMEM/scalar), build kernel at
Sponza scale, SBVH quality, then the soft kernel (suspected compile-helper
crasher goes LAST so a wedge loses the least)."""
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps, batches=4):
    _force(fn())
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        _force(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def step_feasibility():
    from probes.probe_r3d import d1_smem, d2_scalar_loop, d3_rowwalk
    for fn, arg in ((d1_smem, 64 * 1024), (d1_smem, 160 * 1024),
                    (d2_scalar_loop, 20480), (d3_rowwalk, 20480)):
        try:
            fn(arg)
        except Exception as e:  # noqa: BLE001
            log(f"feas {fn.__name__}({arg}) FAILED: {type(e).__name__}: "
                f"{str(e)[:200]}")


def step_build_kernel():
    import jax
    import jax.numpy as jnp
    from tpurt.bvh import lbvh as L
    from tpurt.scenes import sponza_scene
    LEAF = 14
    mesh = jax.device_put(sponza_scene(260_000))

    b1 = jax.jit(lambda v, i: L.build_lbvh(v, i, leaf_size=LEAF,
                                           builder="search"))
    b2 = jax.jit(lambda v, i: L.build_lbvh(v, i, leaf_size=LEAF,
                                           builder="kernel"))
    r1 = b1(mesh.vertices, mesh.indices)
    r2 = b2(mesh.vertices, mesh.indices)
    # sanity: same leaf coverage; boxes close (topologies may differ only
    # in tie-breaks)
    log(f"build-kernel sanity: root1={np.asarray(r1.root_min)} "
        f"root2={np.asarray(r2.root_min)}")
    t1 = timed(lambda: jnp.sum(b1(mesh.vertices, mesh.indices).nodes_box),
               10)
    t2 = timed(lambda: jnp.sum(b2(mesh.vertices, mesh.indices).nodes_box),
               10)
    log(f"full build search: {t1*1e3:.2f} ms | KERNEL: {t2*1e3:.2f} ms")
    # fused rebuild (build + collapse) with kernel builder
    from tpurt.bvh.wide import widen_lbvh, count_wide, round_up_bucket
    nw_pad = round_up_bucket(max(count_wide(r1), 1))
    for name, bf in (("search", "search"), ("kernel", "kernel")):
        reb = jax.jit(lambda v, i, b=bf: jnp.sum(widen_lbvh(
            L.build_lbvh(v, i, leaf_size=LEAF, builder=b),
            nw_pad=nw_pad).nodes))
        t = timed(lambda: reb(mesh.vertices, mesh.indices), 10)
        log(f"fused rebuild ({name}): {t*1e3:.2f} ms")


def step_sbvh():
    import jax
    import jax.numpy as jnp
    from tpurt.app import make_tracers
    from tpurt.bvh.sah import cpu_bvh_to_lbvh
    from tpurt.native import build_sah_bvh
    from tpurt.bvh.wide import build_wide
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig
    W, H, LEAF = 1920, 1080, 14
    cfg = RenderConfig(width=W, height=H, leaf_size=LEAF)
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    v = np.asarray(host.vertices, np.float32)
    idx = np.asarray(host.indices, np.int32)
    _, trace_any = make_tracers(cfg)
    light = Light.directional((0.25, 0.9, 0.2))
    gbuf = None
    for name, kw in (("sah", dict()),
                     ("sbvh_a1e-5_b1.3",
                      dict(spatial_alpha=1e-5, spatial_budget=1.3)),
                     ("sbvh_a1e-4_b1.2",
                      dict(spatial_alpha=1e-4, spatial_budget=1.2))):
        try:
            cpu = build_sah_bvh(v, idx, leaf_size=LEAF, **kw)
            b3 = cpu_bvh_to_lbvh(cpu, host, LEAF)
            w3 = build_wide(b3)
            if gbuf is None:
                gb = jax.jit(lambda a, m, c: gbuffer_pass(
                    lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H))
                gbuf = gb(w3, mesh, cam)
                globals()["_gbuf_valid"] = int(
                    np.asarray(gbuf["valid"]).sum())
            valid = globals()["_gbuf_valid"]
            so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
                g, l, cfg.shadow_bias, None,
                scene_bounds=(b.root_min, b.root_max)))(gbuf, light, b3)
            shade = jax.jit(lambda a, o, d, t: jnp.sum(
                trace_any(a, o, d, t).astype(jnp.int32)))
            s = timed(lambda: shade(w3, so, sd, stm), 48)
            nl = b3.num_sorted_tris // LEAF
            log(f"{name}: refs={cpu.tri_order.shape[0]} leaves={nl} "
                f"leafVMEM={nl*512/1e6:.1f}MB trace {s*1e3:.2f} ms -> "
                f"{valid/s/1e6:.1f} Mrays/s")
            globals().setdefault("_soft_inputs", (w3, b3, gbuf, mesh, cam))
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}")


def step_soft():
    import jax
    import jax.numpy as jnp
    from tpurt.kernels.traverse import trace_any_soft_pallas
    from tpurt.passes.shadow import shadow_pass
    from tpurt.app import make_tracers
    from tpurt.types import Light, RenderConfig
    from tpurt.scenes import teapot_scene, default_camera_for
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import trace_closest_pallas

    # tiny first: does the soft kernel COMPILE at all?
    mesh = jax.device_put(teapot_scene(1200))
    bvh = build_lbvh(mesh.vertices, mesh.indices, leaf_size=8,
                     builder="search")
    wide = build_wide(bvh)
    cam = default_camera_for(teapot_scene(1200))
    o, d = generate_rays(cam, 64, 64)
    t, tid = trace_closest_pallas(wide, o, d)
    valid = tid >= 0
    pos = o + d * jnp.where(valid, t, 0.0)[..., None]
    axis = jnp.asarray([0.45, 0.8, 0.3])
    axis = axis / jnp.linalg.norm(axis)
    counts = trace_any_soft_pallas(wide, pos + 1e-3 * axis, valid, axis,
                                   jnp.cos(0.05), 4, 7)
    c = np.asarray(counts)[np.asarray(valid)]
    log(f"soft kernel tiny: compiled+ran, count mean={c.mean():.3f} "
        f"distinct={np.unique(c)[:6]}")

    if "_soft_inputs" not in globals():
        log("soft: no sponza inputs from sbvh step; skipping big timing")
        return
    w3, b3, gbuf, mesh, cam = globals()["_soft_inputs"]
    sun = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)
    valid = globals()["_gbuf_valid"]
    cfg = RenderConfig(width=1920, height=1080, leaf_size=14)
    _, trace_any = make_tracers(cfg)
    soft = jax.jit(lambda a, g, s: jnp.sum(trace_any_soft_pallas(
        a, g["position"] + g["gnormal"] * 1e-3, g["valid"],
        jnp.asarray(sun.direction), jnp.cos(sun.angular_radius), 8, s)))
    t = timed(lambda: soft(w3, gbuf, jnp.int32(7)), 10)
    log(f"soft-kernel sponza spp=8: {t*1e3:.2f} ms -> "
        f"{valid*8/t/1e6:.1f} Mrays/s")
    sp8 = jax.jit(lambda a, g, k, b=b3: jnp.sum(shadow_pass(
        lambda o, d, tm: trace_any(a, o, d, tm), g, sun, 8, k, 1e-3,
        scene_bounds=(b.root_min, b.root_max))))
    t = timed(lambda: sp8(w3, gbuf, jax.random.PRNGKey(1)), 10)
    log(f"soft-XLA sponza spp=8: {t*1e3:.2f} ms -> "
        f"{valid*8/t/1e6:.1f} Mrays/s")


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    sys.path.insert(0, "/root/repo")
    steps = sys.argv[1:] or ["feas", "build", "sbvh", "soft"]
    for s in steps:
        try:
            {"feas": step_feasibility, "build": step_build_kernel,
             "sbvh": step_sbvh, "soft": step_soft}[s]()
        except Exception as e:  # noqa: BLE001
            log(f"STEP {s} FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("probe_r3e done")
