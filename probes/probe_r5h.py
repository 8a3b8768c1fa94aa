"""Probe r5h (TPU): why did rebuild_frame_ms hit 94.3 ms on the area
default when r5d measured the clustered-FIXED attr G-buffer at 36.65?

Isolate collapse mode x M for the CLOSEST-HIT (attr G-buffer) pass on
rebuilt trees, alongside the shadow pass, so the frame default can pick
the right frontier: the area collapse wins any-hit decisively (r5e,
12.00 vs 15.95 ms) but may order children badly for the early-t cull
closest walks depend on.
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

    from tpurt.bvh.lbvh import auto_split_blocks, build_lbvh
    from tpurt.bvh.wide import (count_wide, round_up_bucket,
                                widen_area_kernel, widen_lbvh)
    from tpurt.passes.gbuffer import gbuffer_attr_pass
    from tpurt.passes.shading import (attr_payload_columns,
                                      leaf_attr_rows_from_sorted)
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light

    W, H = 1920, 1080
    leaf = 14
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    t = int(np.asarray(mesh.indices.shape[0]))
    m_auto = auto_split_blocks(t, leaf)

    from tpurt.bvh.wide import order_children_for_point

    def run(tag, msp, collapse, ordered=False):
        try:
            b0 = build_lbvh(mesh.vertices, mesh.indices, leaf_size=leaf,
                            split_blocks=msp)
            nw = round_up_bucket(max(count_wide(b0, mode=collapse), 1))
            extra = attr_payload_columns(mesh)

            def _acc(v, i):
                r = build_lbvh(v, i, leaf_size=leaf, boxes="defer",
                               extra_payload=extra,
                               split_blocks=msp)
                b, ex = r
                if collapse == "area":
                    w, _ = widen_area_kernel(b, nw)
                else:
                    w = widen_lbvh(b, nw_pad=nw, mode="fixed")
                if ordered:
                    w = order_children_for_point(w, jnp.asarray(
                        cam.position))
                at = leaf_attr_rows_from_sorted(ex, b.tri_id,
                                                b.num_blocks, leaf, False)
                return w, at
            acc, at = jax.jit(_acc)(mesh.vertices, mesh.indices)
            gba = jax.jit(lambda a, t0_, t1_, m, c: jnp.sum(
                gbuffer_attr_pass(a, (t0_, t1_), m, c, W, H)["normal"]))
            gb_ms = timed(lambda: gba(acc, at[0], at[1], mesh, cam),
                          16) * 1e3
            gbuf = jax.jit(lambda a, t0_, t1_, m, c: gbuffer_attr_pass(
                a, (t0_, t1_), m, c, W, H))(acc, at[0], at[1], mesh, cam)
            so, sd, stm = jax.jit(lambda g, b: shadow_ray_batch(
                g, light, 1e-3, None,
                scene_bounds=(b.root_min, b.root_max)))(gbuf, b0)
            from tpurt.kernels.traverse import trace_any_pallas
            sh = jax.jit(lambda a, o, d, t_: jnp.sum(
                trace_any_pallas(a, o, d, t_).astype(jnp.int32)))
            sh_ms = timed(lambda: sh(acc, so, sd, stm), 32) * 1e3
            log(f"{tag}: nw {nw:6d} attr-gbuffer {gb_ms:6.2f} shadow "
                f"{sh_ms:6.2f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}")

    run(f"M={m_auto} area        ", m_auto, "area")
    run(f"M={m_auto} fixed       ", m_auto, "fixed")
    run(f"M={m_auto} area  ord", m_auto, "area", ordered=True)
    run(f"M={m_auto} fixed ord", m_auto, "fixed", ordered=True)
    run("M=2*auto fixed      ", 2 * m_auto, "fixed")


if __name__ == "__main__":
    main()
