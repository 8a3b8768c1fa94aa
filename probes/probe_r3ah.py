"""Round-3 probe AH: can a 1M-triangle scene run as ONE wide accel?

The 20 MB VMEM budget (an old empirical Mosaic ceiling) chunks Sponza-x4
into 4 accels that trace at 38 Mrays/s (probe r3y) with a 456 s
host-orchestrated build. Probe r3aa ran ~50 MB of const blocks in one
kernel, so a 1M-tri single accel (tris ~37 MB + nodes ~9 MB) may simply
fit. Measures: on-device LBVH build, single-accel closest + shadow at
1080p, vs the chunked numbers. NEW compile at a big const size — run
standalone; needs AXON_LIBTPU_OVERRIDES for the helper's AOT path.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, iters=16):
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

    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide, round_up_bucket,
                                widen_lbvh, order_children_for_point)
    from tpurt.camera import generate_rays
    from tpurt.kernels.pack import wide_vmem_bytes
    from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import default_camera_for, sponza_scene, merge_meshes
    from tpurt.types import Light, Mesh

    # Same 1M-tri scene construction as probe r3y: 4 stacked Sponzas.
    import dataclasses
    parts = []
    base = sponza_scene()
    for kq in range(4):
        off = np.float32([0, kq * 14.0, 0])
        parts.append(dataclasses.replace(
            base, vertices=base.vertices + off))
    host_mesh = merge_meshes(parts)
    mesh = jax.device_put(host_mesh)
    cam = default_camera_for(host_mesh)
    log(f"tris={host_mesh.indices.shape[0]}")

    LEAF = 14
    t0 = time.perf_counter()
    bvh = jax.block_until_ready(jax.jit(lambda v, i: build_lbvh(
        v, i, leaf_size=LEAF, boxes="defer"))(mesh.vertices, mesh.indices))
    log(f"on-device LBVH build (1M tris, defer): "
        f"{(time.perf_counter()-t0)*1e3:.0f} ms incl compile")
    f_build = jax.jit(lambda v, i: jnp.sum(build_lbvh(
        v, i, leaf_size=LEAF, boxes='defer').tri_v0))
    log(f"build steady-state: {timed(lambda: f_build(mesh.vertices, mesh.indices), 8):.1f} ms")

    # Fixed-frontier collapse: no node boxes needed (deferred-box path).
    nw_pad = round_up_bucket(max(count_wide(bvh, mode="fixed"), 1))
    ntris = int(bvh.tri_v0.shape[0])
    log(f"single accel VMEM: {wide_vmem_bytes(nw_pad, ntris, LEAF)/1e6:.1f} MB "
        f"(nw_pad={nw_pad})")
    wide = jax.block_until_ready(
        jax.jit(lambda b: widen_lbvh(b, nw_pad=nw_pad, mode="fixed"))(bvh))
    acc = order_children_for_point(wide, jnp.asarray(cam.position))

    W, H = 1920, 1080
    o, d = jax.jit(lambda: generate_rays(cam, W, H))()
    fc = jax.jit(lambda a, o, d: trace_closest_pallas(
        a, o, d, return_sorted=True, gather_tri_id=False)[0].sum())
    t0 = time.perf_counter()
    np.asarray(fc(acc, o, d))
    log(f"closest compiled+ran in {time.perf_counter()-t0:.0f}s")
    log(f"closest-hit 1080p (single accel): {timed(lambda: fc(acc, o, d)):.2f} ms "
        f"(chunked x4 was 157.0)")

    t, _, sidx = jax.jit(lambda a, o, d: trace_closest_pallas(
        a, o, d, return_sorted=True, gather_tri_id=False))(acc, o, d)
    valid = sidx >= 0
    nvalid = int(np.asarray(valid).sum())
    gbuf = {"position": o + d * jnp.where(valid, t, 0.0)[..., None],
            "gnormal": jnp.broadcast_to(jnp.float32([0, 1, 0]), o.shape),
            "valid": valid}
    light = Light.directional((0.25, 0.9, 0.2))
    so, sd, stm = jax.jit(lambda g: shadow_ray_batch(
        g, light, 1e-3, None, scene_bounds=(wide.root_min,
                                            wide.root_max)))(gbuf)
    fs = jax.jit(lambda a, o_, d_, tm: jnp.sum(
        trace_any_pallas(a, o_, d_, tm).astype(jnp.int32)))
    ms = timed(lambda: fs(wide, so, sd, stm))
    log(f"shadow any-hit 1080p: {ms:.2f} ms -> {nvalid/ms/1e3:.1f} Mrays/s "
        f"(chunked x4 was 52.0 ms / 38.2)")
    log("probe_r3ah done")


if __name__ == "__main__":
    main()
