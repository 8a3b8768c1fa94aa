"""Probe r5e (TPU): sub-leaf clustering operating point — M sweep x
collapse mode, Sponza 1080p same-tree rebuild+trace.

r5d: M=9479 fixed-collapse gives rebuild 17.82 + shadow 16.37 = 34.18
(vs chop14 13.28 + 20.22 = 33.49 — a wash: the shadow win is eaten by
the bigger tree's build cost). Questions:
  1. Does a smaller M keep most of the shadow win at less build cost?
  2. Does the AREA collapse kernel compound with clustering (r4f: area
     widen cut Morton pops ~30%; on clustered sub-leaves untested)?
No new Mosaic kernels (shapes may differ -> recompiles of known-good
kernels only).
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

    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide,
                                order_children_for_point, round_up_bucket,
                                widen_area_kernel, widen_lbvh)
    from tpurt.kernels.traverse import (trace_any_pallas,
                                        trace_closest_pallas)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    leaf = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    sah = jax.device_put(build_sah_lbvh(host_mesh, leaf))
    sacc = build_wide(sah)
    st = jax.jit(make_shade_table)(sah, mesh)
    gb = jax.jit(lambda a, m, c: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True,
                                          gather_tri_id=False),
        m, c, W, H, shade_table=st))
    gbuf = gb(order_children_for_point(sacc, cam.position), mesh, cam)
    so, sd, stm = jax.jit(lambda g, b: shadow_ray_batch(
        g, light, 1e-3, None,
        scene_bounds=(b.root_min, b.root_max)))(gbuf, sah)
    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))

    def run(tag, splits, collapse):
        try:
            b0 = build_lbvh(mesh.vertices, mesh.indices, leaf_size=leaf,
                            split_blocks=splits)
            mode = "area" if collapse == "area" else "fixed"
            nw = round_up_bucket(max(count_wide(b0, mode=mode), 1))

            if collapse == "area":
                def _acc(v, i):
                    b = build_lbvh(v, i, leaf_size=leaf, boxes="defer",
                                   split_blocks=splits)
                    w, _ = widen_area_kernel(b, nw)
                    return w
            else:
                def _acc(v, i):
                    b, dep = build_lbvh(v, i, leaf_size=leaf,
                                        boxes="defer", want_depth=True,
                                        split_blocks=splits)
                    return widen_lbvh(b, nw_pad=nw, mode="fixed",
                                      depths=dep)
            reb = jax.jit(lambda v, i: jnp.sum(_acc(v, i).nodes))
            reb_ms = timed(lambda: reb(mesh.vertices, mesh.indices),
                           30) * 1e3
            acc = jax.jit(_acc)(mesh.vertices, mesh.indices)
            sh_ms = timed(lambda: shade(acc, so, sd, stm), 32) * 1e3
            log(f"{tag}: nw {nw:6d} rebuild {reb_ms:6.2f} + shadow "
                f"{sh_ms:6.2f} = {reb_ms + sh_ms:6.2f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:250]}")

    run("M=9479 area ", 9479, "area")      # compound question first
    run("M=4000 fixed", 4000, "fixed")
    run("M=6000 fixed", 6000, "fixed")
    run("M=4000 area ", 4000, "area")
    run("M=0    area ", 0, "area")         # r4 baseline cross-check


if __name__ == "__main__":
    main()
