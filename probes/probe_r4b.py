"""Probe r4b: sweep-SAH top-tree steering (kernels/build.py
sweep_sah_priorities) measured on the real config-2 workload.

Questions:
  1. What does the priorities kernel cost on-device at Sponza scale
     (~65k leaves -> 8k blocks, serial scalar sweep)?
  2. Does the steered rebuilt tree trace FASTER than the plain Morton
     tree on the 1080p Sponza shadow-ray set (r3: 20.25 vs 7.86 SBVH)?
  3. What does the full fused rebuild cost with top_sah=True?

Variants: plain leaf14 fixed (r3 baseline), top_sah leaf14 fixed, and
a couple of SWEEP knob settings if the default disappoints.
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

    from tpurt.bvh.lbvh import (adjacent_deltas, build_lbvh,
                                morton_of_points, sah_cost, _leaf_boxes)
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide, round_up_bucket,
                                widen_lbvh)
    from tpurt.kernels.build import sweep_sah_priorities
    from tpurt.kernels.traverse import (trace_any_pallas,
                                        trace_any_pallas_stats,
                                        trace_closest_pallas)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.passes.shading import make_shade_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    sah = build_sah_lbvh(host_mesh, 14)
    sbvh = jax.device_put(sah)
    sacc = build_wide(sbvh)
    st0 = jax.jit(make_shade_table)(sbvh, mesh)
    gb = jax.jit(lambda a, m, c, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True,
                                          gather_tri_id=False),
        m, c, W, H, shade_table=st))
    gbuf = gb(sacc, mesh, cam, st0)
    shadow_rays = jax.jit(lambda g, l, b: shadow_ray_batch(
        g, l, 1e-3, None, scene_bounds=(b.root_min, b.root_max)))
    so, sd, stm = shadow_rays(gbuf, light, sbvh)

    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))

    def report(name, accel, rebuild_fn, bvh=None):
        reb_ms = timed(rebuild_fn, 20) * 1e3 if rebuild_fn else 0.0
        tr_ms = timed(lambda: shade(accel, so, sd, stm), 32) * 1e3
        it = float(np.asarray(jax.jit(
            lambda a, o, d, tm: jnp.mean(trace_any_pallas_stats(
                a, o, d, tm)[1].astype(jnp.float32)))(
                    accel, so, sd, stm)))
        cost = float(sah_cost(bvh)) if bvh is not None else float("nan")
        log(f"{name:30s} rebuild {reb_ms:7.2f}  trace {tr_ms:6.2f}  "
            f"total {reb_ms + tr_ms:6.2f}  iters {it:6.1f}  sah {cost:8.2f}")

    report("SBVH static (ref)", sacc, None, sbvh)

    leaf, bits = 14, 30

    # 1. Priorities kernel cost alone (on top of a built tree's inputs).
    b0 = build_lbvh(mesh.vertices, mesh.indices, leaf_size=leaf,
                    morton_bits=bits)
    nl = b0.num_leaves
    log(f"leaves={nl} blocks={-(-nl // 8)}")
    v0a, e1a, e2a = b0.tri_v0, b0.tri_e1, b0.tri_e2

    def prio_only(v0, e1, e2):
        # Codes recomputed from the (already sorted) triangle stream —
        # measures leafboxes + deltas + the sweep kernel itself.
        v1, v2 = v0 + e1, v0 + e2
        tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
        tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
        c = (tmin + tmax) * 0.5
        chi = morton_of_points(c, b0.root_min, b0.root_max)
        lmin, lmax, _, _ = _leaf_boxes(v0, e1, e2, leaf)
        d = adjacent_deltas((chi[::leaf], None))
        return jnp.sum(sweep_sah_priorities(d, lmin, lmax))

    pj = jax.jit(prio_only)
    try:
        ms = timed(lambda: pj(v0a, e1a, e2a), 20) * 1e3
        log(f"sweep_sah_priorities (+codes+leafboxes): {ms:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"priorities kernel FAILED: {type(e).__name__}: {str(e)[:300]}")

    # 2. Rebuilt-tree variants.
    for name, ts in [("plain leaf14 fixed", False),
                     ("top_sah leaf14 fixed", True)]:
        try:
            b = build_lbvh(mesh.vertices, mesh.indices, leaf_size=leaf,
                           morton_bits=bits, top_sah=ts)
            nw = round_up_bucket(max(count_wide(b, mode="fixed"), 1))

            def reb(v, i, _ts=ts, _nw=nw):
                bb, dep = build_lbvh(v, i, leaf_size=leaf, morton_bits=bits,
                                     boxes="defer", want_depth=True,
                                     top_sah=_ts)
                return widen_lbvh(bb, nw_pad=_nw, mode="fixed", depths=dep)

            rebj = jax.jit(lambda v, i: reb(v, i))
            accel = rebj(mesh.vertices, mesh.indices)
            reb_s = jax.jit(lambda v, i: jnp.sum(reb(v, i).nodes))
            report(name, accel, lambda: reb_s(mesh.vertices, mesh.indices),
                   b)
        except Exception as e:  # noqa: BLE001
            log(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
