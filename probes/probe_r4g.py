"""Probe r4g (TPU): why didn't the quality rebuild move the trace?

BENCH r4: plain Morton fixed-cut trace 20.28 ms; top_sah+area-kernel
trace 20.30 ms — identical, despite the exact CPU walker counting 2x
fewer pops (32.8 -> 16.8 shadow pops/packet, camera-ordered accels).
Disambiguate with the DEVICE's own iteration counter
(trace_any_pallas_stats) on the same 1080p shadow-ray set:

  - if device iters DO halve but time doesn't -> the shadow kernel is
    not iteration-bound for Morton-class accels (find the real bound);
  - if device iters DON'T halve -> the built accel differs from the
    walker's model (ordering / steering not taking effect on device).

Accels: static SBVH | Morton fixed | top_sah + area kernel — each both
as-built and camera-point-ordered (the walker counted the ordered ones).
"""

import os
import sys
import time

os.environ.setdefault("AXON_LIBTPU_OVERRIDES",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(r):
    r = r[0] if isinstance(r, tuple) else r
    return np.asarray(r).ravel()[0]


def timed(fn, reps, batches=3):
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

    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide,
                                order_children_for_point, round_up_bucket,
                                widen_area_kernel, widen_lbvh)
    from tpurt.kernels.traverse import (trace_any_pallas,
                                        trace_any_pallas_stats,
                                        trace_closest_pallas)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.passes.shading import make_shade_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    leaf = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    sah = build_sah_lbvh(host_mesh, leaf)
    sbvh = jax.device_put(sah)
    sacc = build_wide(sbvh)
    st0 = jax.jit(make_shade_table)(sbvh, mesh)
    gb = jax.jit(lambda a, m, c, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True,
                                          gather_tri_id=False),
        m, c, W, H, shade_table=st))
    gbuf = gb(sacc, mesh, cam, st0)
    so, sd, stm = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, 1e-3, None, scene_bounds=(b.root_min, b.root_max)))(
            gbuf, light, sbvh)

    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))
    iters = jax.jit(lambda a, o, d, tm: jnp.mean(
        trace_any_pallas_stats(a, o, d, tm)[1].astype(jnp.float32)))

    bj = jax.jit(functools.partial(build_lbvh, leaf_size=leaf))
    bts = jax.jit(functools.partial(build_lbvh, leaf_size=leaf,
                                    top_sah=True))
    b_plain = bj(mesh.vertices, mesh.indices)
    b_ts = bts(mesh.vertices, mesh.indices)
    nw_f = round_up_bucket(max(count_wide(b_plain, mode="fixed"), 1))
    nw_a = round_up_bucket(max(count_wide(b_ts, mode="area"), 1))

    acc_fixed = jax.jit(lambda b: widen_lbvh(b, nw_pad=nw_f,
                                             mode="fixed"))(b_plain)
    acc_q = jax.jit(lambda b: widen_area_kernel(b, nw_a)[0])(b_ts)

    for name, acc in [("SBVH static", sacc),
                      ("Morton fixed", acc_fixed),
                      ("top_sah+area", acc_q)]:
        for oname, a in [("as-built", acc),
                         ("cam-ordered", order_children_for_point(
                             acc, cam.position))]:
            try:
                ms = timed(lambda: shade(a, so, sd, stm), 32) * 1e3
                it = float(iters(a, so, sd, stm))
                log(f"{name:13s} {oname:11s} trace {ms:6.2f} ms  "
                    f"iters/packet {it:6.2f}  nw {a.num_wide}")
            except Exception as e:  # noqa: BLE001
                log(f"{name:13s} {oname:11s} FAILED "
                    f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
