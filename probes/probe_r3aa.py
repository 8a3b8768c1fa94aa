"""Round-3 probe AA: attribute-tracked closest hit vs shade-table gather.

The 1080p ray-cast G-buffer costs 46.9 ms of which the per-pixel
shade-row gather is 23.3 ms (probe r3w) — width-flat, latency-bound.
trace_closest_attrs_pallas tracks the winner's full shading attributes
with in-register selects instead (~13 extra selects per candidate
triangle). This probe measures the end-to-end G-buffer both ways on
Sponza-class geometry at 1080p, plus the bare kernels.

NEW-KERNEL COMPILE — run standalone (a Mosaic crash wedges the remote
compile helper ~25 min; nothing else should be queued behind this).
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, iters=24):
    fn()  # compile+warm
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(r).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.passes.gbuffer import gbuffer_attr_pass, gbuffer_pass
    from tpurt.passes.shading import make_leaf_attr_rows, make_shade_table
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.scenes import default_camera_for, sponza_scene

    W, H = 1920, 1080
    host_mesh = sponza_scene()
    mesh = jax.device_put(host_mesh)
    cam = default_camera_for(host_mesh)
    bvh = build_sah_lbvh(host_mesh, 14)
    wide = jax.device_put(build_wide(bvh))
    st = jax.device_put(jax.jit(make_shade_table)(bvh, mesh))
    at0, at1 = jax.jit(make_leaf_attr_rows)(bvh, mesh)
    at0, at1 = jax.device_put(at0), jax.device_put(at1)
    log(f"tris={host_mesh.indices.shape[0]} st={st.shape} "
        f"at0={at0.shape} at1={at1.shape} textured={host_mesh.textured}")

    # Block 1 (cached families): baseline shade-table G-buffer.
    def base(acc, stt):
        g = gbuffer_pass(
            lambda o, d: trace_closest_pallas(acc, o, d, return_sorted=True,
                                              gather_tri_id=False),
            mesh, cam, W, H, shade_table=stt)
        # consume every channel so nothing is DCE'd (bench r3q lesson)
        return (g["position"].sum() + g["normal"].sum() + g["gnormal"].sum()
                + g["albedo"].sum() + g["depth"].sum()
                + g["tri_id"].sum() + g["valid"].sum())
    fb = jax.jit(base)
    log(f"gbuffer shade-table: {timed(lambda: fb(wide, st)) * 1e3:.2f} ms")

    # Block 2: NEW attr kernel.
    def attr(acc, a0, a1):
        g = gbuffer_attr_pass(acc, (a0, a1), mesh, cam, W, H)
        return (g["position"].sum() + g["normal"].sum() + g["gnormal"].sum()
                + g["albedo"].sum() + g["depth"].sum()
                + g["tri_id"].sum() + g["valid"].sum())
    fa = jax.jit(attr)
    t0 = time.perf_counter()
    v = fa(wide, at0, at1)
    np.asarray(v)
    log(f"attr kernel compiled+ran in {time.perf_counter() - t0:.1f}s")
    log(f"gbuffer ATTR-TRACKED: {timed(lambda: fa(wide, at0, at1)) * 1e3:.2f} ms")

    # Quick value sanity: valid counts match.
    ga = jax.jit(lambda acc, a0, a1: gbuffer_attr_pass(
        acc, (a0, a1), mesh, cam, W, H)["valid"].sum())(wide, at0, at1)
    gb = jax.jit(lambda acc, stt: gbuffer_pass(
        lambda o, d: trace_closest_pallas(acc, o, d, return_sorted=True,
                                          gather_tri_id=False),
        mesh, cam, W, H, shade_table=stt)["valid"].sum())(wide, st)
    log(f"valid attr={int(ga)} table={int(gb)}")
    log("probe_r3aa done")


if __name__ == "__main__":
    main()
