"""Probe r5d (TPU): sub-leaf clustered rebuild (config 2) vs the r3/r4
fixed-chop rebuild, on Sponza-class 1080p.

Measures, in ONE process:
  A. chop14 fused rebuild (control)  : rebuild ms + rebuilt shadow ms
  B. clustered fused rebuild (auto M): rebuild ms + rebuilt shadow ms
     + rebuilt-tree attr G-buffer ms (the rebuild_frame coherence row —
     raster fallback is 73.6 ms, static-SBVH attr 34.6)

CPU prediction (probe r5c): shadow pops/packet 11.1 -> 6.4, closest
33.6 -> 22.1; per-pop cost unchanged => shadow ~20.4 -> ~12-13 ms.
No new Mosaic kernels — only existing kernels at new accel shapes.
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

    from tpurt.app import _rebuild_fused
    from tpurt.bvh.lbvh import auto_split_blocks, build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide,
                                order_children_for_point, round_up_bucket)
    from tpurt.kernels.traverse import trace_any_pallas
    from tpurt.passes.gbuffer import gbuffer_attr_pass
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    leaf = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))

    # Shadow rays from the STATIC SBVH G-buffer (same protocol as bench:
    # the ray set is fixed; only the accel under test changes).
    sah = jax.device_put(build_sah_lbvh(host_mesh, leaf))
    sacc = build_wide(sah)
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.passes.shading import make_shade_table
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

    m_auto = auto_split_blocks(mesh.num_triangles, leaf)
    log(f"auto split blocks M = {m_auto}")

    def run(tag, splits):
        b0 = build_lbvh(mesh.vertices, mesh.indices, leaf_size=leaf,
                        split_blocks=splits)
        nw = round_up_bucket(max(count_wide(b0, mode="fixed"), 1))
        log(f"{tag}: leaves {b0.num_leaves} nw_pad {nw}")
        reb = jax.jit(lambda v, i: jnp.sum(_rebuild_fused(
            v, i, mesh, leaf, nw, tables="attr", split_blocks=splits)[1]
            .nodes))
        reb_ms = timed(lambda: reb(mesh.vertices, mesh.indices), 30) * 1e3
        _, acc, _, _, at, _ = _rebuild_fused(
            mesh.vertices, mesh.indices, mesh, leaf, nw, tables="attr",
            split_blocks=splits)
        sh_ms = timed(lambda: shade(acc, so, sd, stm), 32) * 1e3
        log(f"{tag}: fused rebuild {reb_ms:6.2f} ms | rebuilt shadow "
            f"{sh_ms:6.2f} ms | same-tree {reb_ms + sh_ms:6.2f} ms")
        return acc, at

    run("A chop14     ", 0)
    acc_b, at_b = run("B clustered  ", m_auto)

    # Rebuilt-tree attr G-buffer (rebuild_frame coherence, VERDICT #5).
    gba = jax.jit(lambda a, t, m, c: jnp.sum(gbuffer_attr_pass(
        order_children_for_point(a, c.position), t, m, c, W, H)["position"]))
    try:
        gb_ms = timed(lambda: gba(acc_b, at_b, mesh, cam), 12) * 1e3
        log(f"B clustered  : rebuilt-tree attr G-buffer {gb_ms:6.2f} ms "
            f"(raster fallback 73.6, static-SBVH attr 34.6)")
    except Exception as e:  # noqa: BLE001
        log(f"attr G-buffer failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
