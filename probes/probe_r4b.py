"""Probe r4b (TPU): the config-2 decision matrix — per-frame rebuild
cost + SAME-TREE shadow trace for every quality combo, against the
static SBVH reference.

Exact CPU packet-walk counts (probe r4f) rank the candidates:
  shadow pops/packet — SBVH 3.0 | Morton fixed 32.8 | Morton area 22.7 |
  top_sah fixed 28.4 | top_sah area 16.8 (deep sweep adds nothing).
This probe prices them on-device:

  matrix: {plain, top_sah} x {fixed cut, area collapse kernel}
  per cell: fused rebuild ms (build+collapse as one program) and the
  rebuilt tree's own 1080p shadow trace ms -> same-tree total.

Also times sweep_sah_priorities alone (the steering kernel's cost).
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
                                morton_of_points, _leaf_boxes)
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide, round_up_bucket,
                                widen_area_kernel, widen_lbvh)
    from tpurt.kernels.build import sweep_sah_priorities
    from tpurt.kernels.traverse import (trace_any_pallas,
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

    sref_ms = timed(lambda: shade(sacc, so, sd, stm), 32) * 1e3
    log(f"SBVH static shadow trace: {sref_ms:.2f} ms")

    # Steering kernel cost alone. NOTE: every build_lbvh call in probes
    # must be JITTED — the eager dispatch path crashes the device
    # (FailedPrecondition poisoning, then a multi-hour tunnel wedge;
    # burned two probe slots this round).
    import functools
    bj = jax.jit(functools.partial(build_lbvh, leaf_size=leaf))
    b0 = bj(mesh.vertices, mesh.indices)
    jax.block_until_ready(b0.nodes_box)

    def prio_only(v0, e1, e2):
        v1, v2 = v0 + e1, v0 + e2
        tmin = jnp.minimum(jnp.minimum(v0, v1), v2)
        tmax = jnp.maximum(jnp.maximum(v0, v1), v2)
        c = (tmin + tmax) * 0.5
        chi = morton_of_points(c, b0.root_min, b0.root_max)
        lmin, lmax, _, _ = _leaf_boxes(v0, e1, e2, leaf)
        d = adjacent_deltas((chi[::leaf], None))
        return jnp.sum(sweep_sah_priorities(d, lmin, lmax))

    try:
        pj = jax.jit(prio_only)
        ms = timed(lambda: pj(b0.tri_v0, b0.tri_e1, b0.tri_e2), 20) * 1e3
        log(f"sweep_sah_priorities (+codes+leafboxes): {ms:.2f} ms")
    except Exception as e:  # noqa: BLE001
        log(f"priorities kernel FAILED: {type(e).__name__}: {str(e)[:300]}")

    for ts in (False, True):
        for collapse in ("fixed", "area"):
            name = f"{'top_sah' if ts else 'plain  '} {collapse}"
            try:
                b1 = jax.jit(functools.partial(
                    build_lbvh, leaf_size=leaf, top_sah=ts))(
                        mesh.vertices, mesh.indices)
                nw = round_up_bucket(max(count_wide(
                    b1, mode=collapse), 1))

                if collapse == "area":
                    def reb(v, i, _ts=ts, _nw=nw):
                        bb = build_lbvh(v, i, leaf_size=leaf,
                                        boxes="defer", top_sah=_ts)
                        w, _ = widen_area_kernel(bb, _nw)
                        return w
                else:
                    def reb(v, i, _ts=ts, _nw=nw):
                        bb, dep = build_lbvh(v, i, leaf_size=leaf,
                                             boxes="defer",
                                             want_depth=True, top_sah=_ts)
                        return widen_lbvh(bb, nw_pad=_nw, mode="fixed",
                                          depths=dep)

                rebj = jax.jit(lambda v, i: reb(v, i))
                accel = rebj(mesh.vertices, mesh.indices)
                reb_s = jax.jit(lambda v, i: jnp.sum(reb(v, i).nodes))
                reb_ms = timed(lambda: reb_s(mesh.vertices,
                                             mesh.indices), 20) * 1e3
                tr_ms = timed(lambda: shade(accel, so, sd, stm), 32) * 1e3
                log(f"{name}: rebuild {reb_ms:6.2f}  trace {tr_ms:6.2f}"
                    f"  same-tree total {reb_ms + tr_ms:6.2f} ms"
                    f"  (nw_pad {nw})")
            except Exception as e:  # noqa: BLE001
                log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
