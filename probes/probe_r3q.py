"""Probe Q: gbuffer_pass overhead decomposition at 1080p on the SBVH."""
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
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import (trace_closest_pallas, _as_packed,
                                        _ray_packets_packed, _common_call_b,
                                        _closest_hit_kernel_w8_b,
                                        PACKETS_PER_STEP)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table, shade_from_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    sah = jax.device_put(build_sah_lbvh(host, LEAF))
    accel = order_children_for_point(build_wide(sah, from_node_boxes=True),
                                     cam.position)
    st0 = jax.jit(make_shade_table)(sah, mesh)
    o, d = map(jax.device_put, generate_rays(cam, 1920, 1080))

    # (a) raw kernel, no unpack/gather: operate on packets directly
    def raw(a, o, d):
        rays, p, meta = _ray_packets_packed(o, d, jnp.float32(3.4e38),
                                            PACKETS_PER_STEP)
        t, sidx = _common_call_b(a, _closest_hit_kernel_w8_b,
                                 (jnp.float32, jnp.int32), rays, 0.0,
                                 None, PACKETS_PER_STEP)
        return jnp.sum(jnp.where(sidx >= 0, 1, 0))
    t = timed(lambda: jax.jit(raw)(accel, o, d))
    log(f"(a) raw kernel (packets in/out): {t*1e3:.2f} ms")

    # (b) + ray generation inside the jit
    def rawgen(a, c):
        oo, dd = generate_rays(c, 1920, 1080)
        return raw(a, oo, dd)
    t = timed(lambda: jax.jit(rawgen)(accel, cam))
    log(f"(b) + generate_rays: {t*1e3:.2f} ms")

    # (c) wrapper incl. unpack + tri_id gather
    def wrap(a, o, d):
        t_, tid, sidx = trace_closest_pallas(a, o, d, return_sorted=True)
        return jnp.sum(jnp.where(sidx >= 0, 1, 0)) + jnp.sum(tid)
    t = timed(lambda: jax.jit(wrap)(accel, o, d))
    log(f"(c) + unpack + tri_id gather: {t*1e3:.2f} ms")

    # (d) + shade-table row gather + decode
    def shaded(a, o, d, st):
        t_, tid, sidx = trace_closest_pallas(a, o, d, return_sorted=True)
        valid = tid >= 0
        pos = o + d * jnp.where(valid, t_, 0.0)[..., None]
        rows = st[jnp.clip(sidx, 0, st.shape[0] - 1)]
        attrs = shade_from_table(rows, pos, valid)
        return jnp.sum(attrs["normal"]) + jnp.sum(tid)
    t = timed(lambda: jax.jit(shaded)(accel, o, d, st0))
    log(f"(d) + shade row gather+decode: {t*1e3:.2f} ms")

    # (e) full gbuffer_pass
    gbs = jax.jit(lambda a, m, c, st: jnp.sum(jnp.where(
        gbuffer_pass(lambda oo, dd: trace_closest_pallas(
            a, oo, dd, return_sorted=True),
            m, c, 1920, 1080, shade_table=st)["valid"], 1.0, 0.0)))
    t = timed(lambda: gbs(accel, mesh, cam, st0))
    log(f"(e) full gbuffer_pass: {t*1e3:.2f} ms")
    log("probe_r3q done")


main()
