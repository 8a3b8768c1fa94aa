"""Round-3 probe C: (1) LBVH build phase timings incl. scan topology,
(2) fused soft-shadow kernel vs XLA scan path, (3) SBVH quality retry.
Run order is cheapest-compile-first so a service wedge loses least."""
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


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from tpurt.app import make_tracers
    from tpurt.bvh import lbvh as L
    from tpurt.bvh.sah import cpu_bvh_to_lbvh
    from tpurt.bvh.wide import build_wide, widen_lbvh, count_wide, \
        round_up_bucket
    from tpurt.native import build_sah_bvh
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_pass, shadow_ray_batch
    from tpurt.kernels.traverse import (trace_closest_pallas,
                                        trace_any_soft_pallas,
                                        trace_any_pallas_stats)
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H = 1920, 1080
    LEAF = 14
    cfg = RenderConfig(width=W, height=H, leaf_size=LEAF)
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    v = np.asarray(host_mesh.vertices, np.float32)
    idx = np.asarray(host_mesh.indices, np.int32)
    _, trace_any = make_tracers(cfg)

    # ---- 1. build phases --------------------------------------------------
    try:
        num_tris = idx.shape[0]
        tpad = -(-max(num_tris, 2 * LEAF) // LEAF) * LEAF
        pad = tpad - num_tris
        tri = jnp.concatenate([mesh.indices,
                               jnp.broadcast_to(mesh.indices[-1:],
                                                (pad, 3))]).astype(jnp.int32)

        def phase_codes(verts, tri):
            v0 = verts[tri[:, 0]]
            v1 = verts[tri[:, 1]]
            v2 = verts[tri[:, 2]]
            tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
            tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
            from tpurt.bvh.morton import morton_of_points
            c = (tmin + tmax) * 0.5
            return morton_of_points(c, tmin.min(0), tmax.max(0))

        codes = jax.jit(phase_codes)(mesh.vertices, tri)
        t = timed(lambda: jnp.sum(jax.jit(phase_codes)(
            mesh.vertices, tri)), 20)
        log(f"build/codes: {t*1e3:.2f} ms")

        sort_f = jax.jit(lambda c: jax.lax.sort(
            (c, jnp.arange(c.shape[0], dtype=jnp.int32)), num_keys=1)[1])
        order = sort_f(codes)
        t = timed(lambda: jnp.sum(sort_f(codes)), 20)
        log(f"build/sort: {t*1e3:.2f} ms")

        def phase_gather(verts, tri, order):
            v0 = verts[tri[:, 0]]
            v1 = verts[tri[:, 1]]
            v2 = verts[tri[:, 2]]
            tri16 = jnp.concatenate(
                [v0, v1 - v0, v2 - v0,
                 jnp.zeros((tri.shape[0], 7), v0.dtype)], axis=1)
            return tri16[order]
        t = timed(lambda: jnp.sum(jax.jit(phase_gather)(
            mesh.vertices, tri, order)), 20)
        log(f"build/tri-gather16: {t*1e3:.2f} ms")

        lc = (codes[order][::LEAF], None)
        lc = (jax.device_put(np.asarray(lc[0])), None)
        tsearch = timed(lambda: jnp.sum(jax.jit(L.karras_topology)(
            lc)[0]), 20)
        log(f"build/topology-search: {tsearch*1e3:.2f} ms")
        tscan = timed(lambda: jnp.sum(jax.jit(L.karras_topology_scan)(
            lc)[0]), 20)
        log(f"build/topology-SCAN: {tscan*1e3:.2f} ms")

        child, first, last = jax.jit(L.karras_topology_scan)(lc)
        sorted16 = jax.jit(phase_gather)(mesh.vertices, tri, order)
        sv0 = sorted16[:, 0:3]
        se1 = sorted16[:, 3:6]
        se2 = sorted16[:, 6:9]

        def phase_boxes(sv0, se1, se2, child, first, last):
            lmin, lmax, _, _ = L._leaf_boxes(sv0, se1, se2, LEAF)
            return L._assemble_node_boxes(lmin, lmax, child, first, last)[0]
        t = timed(lambda: jnp.sum(jax.jit(phase_boxes)(
            sv0, se1, se2, child, first, last)), 20)
        log(f"build/leaf+RMQ boxes: {t*1e3:.2f} ms")

        bvh = jax.jit(lambda v, i: L.build_lbvh(v, i, leaf_size=LEAF))(
            mesh.vertices, mesh.indices)
        nw_pad = round_up_bucket(max(count_wide(bvh), 1))
        t = timed(lambda: jnp.sum(jax.jit(
            lambda b: widen_lbvh(b, nw_pad=nw_pad).nodes)(bvh)), 20)
        log(f"build/collapse-alone: {t*1e3:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"phase timing FAILED: {type(e).__name__}: {str(e)[:250]}")

    # ---- 2. soft-shadow kernel vs XLA scan --------------------------------
    try:
        sah = build_sah_bvh(v, idx, leaf_size=LEAF)
        bvh_s = cpu_bvh_to_lbvh(sah, host_mesh, LEAF) if sah is not None \
            else bvh
        wide_s = build_wide(bvh_s)
        gb = jax.jit(lambda a, m, c: gbuffer_pass(
            lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H))
        gbuf = gb(wide_s, mesh, cam)
        valid = int(np.asarray(gbuf["valid"]).sum())
        sun = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)
        for spp in (8,):
            soft = jax.jit(lambda a, g, s: jnp.sum(trace_any_soft_pallas(
                a, g["position"] + g["gnormal"] * 1e-3, g["valid"],
                jnp.asarray(sun.direction), jnp.cos(sun.angular_radius),
                spp, s)))
            t = timed(lambda: soft(wide_s, gbuf, jnp.int32(7)), 10)
            log(f"soft-kernel spp={spp}: {t*1e3:.2f} ms -> "
                f"{valid*spp/t/1e6:.1f} Mrays/s")
            sp8 = jax.jit(lambda a, g, k, b=bvh_s: jnp.sum(shadow_pass(
                lambda o, d, tm: trace_any(a, o, d, tm), g, sun, spp, k,
                1e-3, scene_bounds=(b.root_min, b.root_max))))
            t = timed(lambda: sp8(wide_s, gbuf, jax.random.PRNGKey(1)), 10)
            log(f"soft-XLA spp={spp}: {t*1e3:.2f} ms -> "
                f"{valid*spp/t/1e6:.1f} Mrays/s")
    except Exception as e:  # noqa: BLE001
        log(f"soft probe FAILED: {type(e).__name__}: {str(e)[:250]}")

    # ---- 3. SBVH quality --------------------------------------------------
    light = Light.directional((0.25, 0.9, 0.2))
    for name, kw in (("sah", dict()),
                     ("sbvh_a1e-5_b1.3",
                      dict(spatial_alpha=1e-5, spatial_budget=1.3))):
        try:
            cpu = build_sah_bvh(v, idx, leaf_size=LEAF, **kw)
            b3 = cpu_bvh_to_lbvh(cpu, host_mesh, LEAF)
            w3 = build_wide(b3)
            so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
                g, l, cfg.shadow_bias, None,
                scene_bounds=(b.root_min, b.root_max)))(gbuf, light, b3)
            shade = jax.jit(lambda a, o, d, t: jnp.sum(
                trace_any(a, o, d, t).astype(jnp.int32)))
            s = timed(lambda: shade(w3, so, sd, stm), 48)
            nl = b3.num_sorted_tris // LEAF
            occ, iters = trace_any_pallas_stats(w3, so, sd, stm)
            it = np.asarray(iters)
            log(f"{name}: refs={cpu.tri_order.shape[0]} leaves={nl} "
                f"leafVMEM={nl*512/1e6:.1f}MB iters mean={it.mean():.2f} "
                f"trace {s*1e3:.2f} ms -> {valid/s/1e6:.1f} Mrays/s "
                f"(occ {int(np.asarray(occ).sum())})")
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:250]}")
    log("probe_r3c done")


if __name__ == "__main__":
    main()
