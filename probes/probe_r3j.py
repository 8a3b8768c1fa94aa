"""Probe J: implicit 8-ary Morton tree — build cost + trace quality.

Sponza 287k tris, 1080p shadow workload. Compare:
  - fused rebuild time: Karras+collapse (current) vs implicit co-sort
  - trace_any on: static SBVH, Karras-collapsed Morton tree, implicit tree
  - refit: RMQ refit (current) vs implicit refit
  - closest-hit on implicit (camera-ordered) for the record
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=20, batches=4):
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
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.implicit import build_wide_implicit, refit_wide_implicit
    from tpurt.bvh.lbvh import build_lbvh, refit_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide, round_up_bucket,
                                widen_lbvh, order_children_for_point)
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    cfg = RenderConfig(width=1920, height=1080, use_pallas=True,
                       leaf_size=LEAF)

    # --- static SBVH for the G-buffer (same rays for every accel) ---
    sah = jax.device_put(build_sah_lbvh(host, LEAF))
    sbvh = build_wide(sah)
    st0 = jax.jit(make_shade_table)(sah, mesh)
    gb = jax.jit(lambda a, mesh, cam, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True),
        mesh, cam, 1920, 1080, shade_table=st))
    gbuf = gb(order_children_for_point(sbvh, cam.position), mesh, cam, st0)
    valid = int(np.asarray(gbuf["valid"]).sum())
    rays = jax.jit(lambda gbuf, light, b: shadow_ray_batch(
        gbuf, light, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))
    so, sd, stm = rays(gbuf, light, sah)
    log(f"valid rays: {valid}")

    def shadow_ms(accel, label):
        f = jax.jit(lambda a, o, d, tm: jnp.sum(
            trace_any_pallas(a, o, d, tm).astype(jnp.int32)))
        t = timed(lambda: f(accel, so, sd, stm), 40)
        occ = int(f(accel, so, sd, stm))
        log(f"shadow [{label}]: {t*1e3:.2f} ms -> "
            f"{valid/t/1e6:.1f} Mrays/s (occ {occ})")
        return t

    # --- builds ---
    build = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))
    bvh = build(mesh.vertices, mesh.indices)
    nw_pad = round_up_bucket(max(count_wide(bvh), 1))
    karras_rebuild = jax.jit(lambda v, i: widen_lbvh(
        build_lbvh(v, i, leaf_size=LEAF), nw_pad=nw_pad))
    kt = timed(lambda: jnp.sum(
        karras_rebuild(mesh.vertices, mesh.indices).nodes), 10)
    log(f"karras fused rebuild: {kt*1e3:.2f} ms")
    kwide = karras_rebuild(mesh.vertices, mesh.indices)

    imp_build = jax.jit(lambda v, i: build_wide_implicit(
        v, i, leaf_size=LEAF))
    it = timed(lambda: jnp.sum(imp_build(mesh.vertices, mesh.indices).nodes),
               10)
    log(f"implicit fused rebuild: {it*1e3:.2f} ms")
    iwide, tri_sorted = jax.jit(lambda v, i: build_wide_implicit(
        v, i, leaf_size=LEAF, with_sorted_ids=True))(
            mesh.vertices, mesh.indices)
    log(f"implicit num_wide={iwide.num_wide} nodes={iwide.nodes.shape}")

    # --- refits ---
    rrefit = jax.jit(lambda b, v, i: jnp.sum(refit_lbvh(b, v, i).nodes_box))
    t = timed(lambda: rrefit(bvh, mesh.vertices, mesh.indices), 10)
    log(f"rmq refit (binary only): {t*1e3:.2f} ms")
    irefit = jax.jit(lambda v, ts, ti: jnp.sum(refit_wide_implicit(
        v, ts, ti, LEAF).nodes))
    t = timed(lambda: irefit(mesh.vertices, tri_sorted, iwide.tri_id), 10)
    log(f"implicit refit (full wide): {t*1e3:.2f} ms")

    # --- trace quality ---
    shadow_ms(sbvh, "sbvh-static")
    shadow_ms(kwide, "karras-morton")
    shadow_ms(iwide, "implicit-morton")

    # closest-hit on implicit (camera-ordered), for the record
    cl = jax.jit(lambda a, mesh, cam, st: jnp.sum(jnp.where(
        gbuffer_pass(lambda o, d: trace_closest_pallas(
            a, o, d, return_sorted=True), mesh, cam, 1920, 1080,
            shade_table=st)["valid"], 1.0, 0.0)))
    for label, acc in (("karras", kwide), ("implicit", iwide)):
        a = order_children_for_point(acc, cam.position)
        t = timed(lambda: cl(a, mesh, cam, st0), 10)
        log(f"closest gbuffer [{label}]: {t*1e3:.2f} ms")

    # parity: occlusion counts should agree across accels up to watertight
    # edge ties; report disagreement counts vs sbvh
    f = jax.jit(lambda a, o, d, tm: trace_any_pallas(a, o, d, tm))
    base = np.asarray(f(sbvh, so, sd, stm))
    for label, acc in (("karras", kwide), ("implicit", iwide)):
        x = np.asarray(f(acc, so, sd, stm))
        log(f"occlusion mismatch vs sbvh [{label}]: {(x != base).sum()}"
            f" / {base.size}")
    log("probe_r3j done")


if __name__ == "__main__":
    main()
