"""Probe r4a: rebuilt-tree (config 2) quality levers.

The strict config-2 metric is rebuild + the rebuilt tree's own trace
(33.85 ms in r3 = 12.0 build + 20.25 trace vs the 7.86 ms static-SBVH
trace). Before designing a restructure pass, measure the cheap knobs:

  A. leaf 14, 30-bit, fixed frontier      (r3 baseline)
  B. leaf 14, 30-bit, AREA frontier       (SAH-greedy collapse grouping)
  C. leaf 14, 60-bit, fixed               (denser codes)
  D. leaf  8, 30-bit, fixed               (smaller leaves)
  E. leaf 14, 30-bit, fixed + area child ORDER (any-hit pops big first)
  F. leaf 16, 30-bit, fixed, transposed leaves (w8t kernel)

For each: fused rebuild ms (the per-frame cost with that config) +
shadow trace ms on the same 1080p ray set + mean traversal iterations.
"""

import os
import sys
import time

os.environ.setdefault("AXON_LIBTPU_OVERRIDES",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    from tpurt.app import make_tracers
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, build_wide_t, count_wide,
                                order_children_by_area, round_up_bucket,
                                widen_lbvh)
    from tpurt.kernels.traverse import (trace_any_pallas,
                                        trace_any_pallas_stats)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.passes.shading import make_shade_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    # Shadow-ray set from the static SBVH G-buffer (one fixed ray set for
    # every variant).
    sah = build_sah_lbvh(host_mesh, 14)
    sbvh = jax.device_put(sah)
    sacc = build_wide(sbvh)
    st0 = jax.jit(make_shade_table)(sbvh, mesh)
    from tpurt.kernels.traverse import trace_closest_pallas
    gb = jax.jit(lambda a, m, c, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True,
                                          gather_tri_id=False),
        m, c, W, H, shade_table=st))
    gbuf = gb(sacc, mesh, cam, st0)
    valid = int(np.asarray(gbuf["valid"]).sum())
    shadow_rays = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, 1e-3, None, scene_bounds=(b.root_min, b.root_max)))
    so, sd, stm = shadow_rays(gbuf, light, sbvh)
    log(f"rays valid={valid}")

    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))
    stats = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas_stats(a, o, d, tm)[1]) /
        trace_any_pallas_stats(a, o, d, tm)[1].shape[0])

    def report(name, accel, rebuild_fn):
        try:
            reb_ms = timed(rebuild_fn, 20) * 1e3 if rebuild_fn else 0.0
            tr_ms = timed(lambda: shade(accel, so, sd, stm), 32) * 1e3
            total = reb_ms + tr_ms
            try:
                it = float(np.asarray(jax.jit(
                    lambda a, o, d, tm: jnp.mean(trace_any_pallas_stats(
                        a, o, d, tm)[1].astype(jnp.float32)))(
                            accel, so, sd, stm)))
            except Exception:  # noqa: BLE001
                it = float("nan")
            log(f"{name:34s} rebuild {reb_ms:7.2f}  trace {tr_ms:6.2f}  "
                f"total {total:6.2f}  iters/packet {it:6.1f}")
        except Exception as e:  # noqa: BLE001
            log(f"{name:34s} FAILED {type(e).__name__}: {str(e)[:150]}")

    # Static SBVH reference trace.
    report("SBVH static (ref)", sacc, None)

    def variant(leaf, bits, mode, order=None, transposed=False):
        import functools as _ft
        b0 = jax.jit(_ft.partial(build_lbvh, leaf_size=leaf,
                                 morton_bits=bits))(
            mesh.vertices, mesh.indices)
        nw = round_up_bucket(max(count_wide(b0, mode=mode), 1))

        if mode == "fixed":
            def reb(v, i):
                b, dep = build_lbvh(v, i, leaf_size=leaf, morton_bits=bits,
                                    boxes="defer", want_depth=True)
                w = widen_lbvh(b, nw_pad=nw, mode="fixed", depths=dep)
                return w
        else:
            def reb(v, i):
                b = build_lbvh(v, i, leaf_size=leaf, morton_bits=bits)
                w = widen_lbvh(b, nw_pad=nw, mode=mode)
                return w
        if order == "area":
            inner = reb
            reb = lambda v, i: order_children_by_area(inner(v, i))
        if transposed:
            inner2 = reb
            def reb(v, i, _f=inner2):
                b = build_lbvh(v, i, leaf_size=leaf, morton_bits=bits)
                w = widen_lbvh(b, nw_pad=nw, mode=mode)
                return build_wide_t(w, b)
        rebj = jax.jit(lambda v, i: reb(v, i))
        accel = rebj(mesh.vertices, mesh.indices)
        reb_scalar = jax.jit(lambda v, i: jnp.sum(reb(v, i).nodes))
        return accel, (lambda: reb_scalar(mesh.vertices, mesh.indices))

    for name, args in [
        ("A leaf14 30b fixed (baseline)", dict(leaf=14, bits=30,
                                               mode="fixed")),
        ("B leaf14 30b AREA", dict(leaf=14, bits=30, mode="area")),
        ("C leaf14 60b fixed", dict(leaf=14, bits=60, mode="fixed")),
        ("D leaf8  30b fixed", dict(leaf=8, bits=30, mode="fixed")),
        ("E leaf14 30b fixed+areaorder", dict(leaf=14, bits=30,
                                              mode="fixed", order="area")),
        ("F leaf16 30b fixed transposed", dict(leaf=16, bits=30,
                                               mode="fixed",
                                               transposed=True)),
    ]:
        try:
            accel, rebf = variant(**args)
            report(name, accel, rebf)
        except Exception as e:  # noqa: BLE001
            log(f"{name:34s} SETUP FAILED {type(e).__name__}: "
                f"{str(e)[:150]}")


if __name__ == "__main__":
    main()
