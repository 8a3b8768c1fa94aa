"""Probe P: G-buffer decomposition — closest-hit kernel alone vs the
full gbuffer_pass, and the seeded two-pass closest vs single-pass,
on the camera-ordered SBVH at 1080p."""
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
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()

    sah = jax.device_put(build_sah_lbvh(host, LEAF))
    accel = order_children_for_point(build_wide(sah, from_node_boxes=True),
                                     cam.position)
    st0 = jax.jit(make_shade_table)(sah, mesh)

    o, d = generate_rays(cam, 1920, 1080)
    o = jax.device_put(o)
    d = jax.device_put(d)

    # kernel alone (single-pass)
    k1 = jax.jit(lambda a, o, d: jnp.sum(jnp.where(
        trace_closest_pallas(a, o, d, return_sorted=True)[2] >= 0,
        1, 0)))
    t = timed(lambda: k1(accel, o, d))
    log(f"closest kernel single-pass: {t*1e3:.2f} ms")

    # kernel alone (seeded two-pass)
    k2 = jax.jit(lambda a, o, d: jnp.sum(jnp.where(
        trace_closest_pallas(a, o, d, return_sorted=True,
                             seeded=True)[2] >= 0, 1, 0)))
    t = timed(lambda: k2(accel, o, d))
    log(f"closest kernel seeded 2-pass: {t*1e3:.2f} ms")

    # full gbuffer_pass, both flavors
    for name, seeded in (("single", False), ("seeded", True)):
        gbs = jax.jit(lambda a, m, c, st, s=seeded: jnp.sum(jnp.where(
            gbuffer_pass(lambda oo, dd: trace_closest_pallas(
                a, oo, dd, return_sorted=True, seeded=s),
                m, c, 1920, 1080, shade_table=st)["valid"], 1.0, 0.0)))
        t = timed(lambda: gbs(accel, mesh, cam, st0))
        log(f"gbuffer_pass [{name}]: {t*1e3:.2f} ms")

    # parity check on TPU
    t1, i1, s1 = jax.jit(lambda a, o, d: trace_closest_pallas(
        a, o, d, return_sorted=True))(accel, o, d)
    t2, i2, s2 = jax.jit(lambda a, o, d: trace_closest_pallas(
        a, o, d, return_sorted=True, seeded=True))(accel, o, d)
    mism = int(np.asarray(jnp.sum(jnp.where(i1 != i2, 1, 0))))
    tdiff = float(np.asarray(jnp.max(jnp.where(
        jnp.isfinite(t1) & jnp.isfinite(t2), jnp.abs(t1 - t2), 0.0))))
    log(f"seeded parity: id mismatches {mism}/2073600, max|dt|={tdiff:.2e}")
    log("probe_r3p done")


main()
