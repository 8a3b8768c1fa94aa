"""Round-3 probe X: ISOLATE the point-penumbra (psoft) Mosaic compiles.

probe_r3z's block 8 failed with an HTTP 500 from the remote compile
helper BEFORE its first log line, so the psoft kernels' compile status
on real TPU is unknown — and shadow_pass routes production point-light
spp>1 frames through trace_any_point_soft_pallas on compiled backends.
A helper crash wedges the service ~25 min, so this probe tests ONLY the
two psoft kernels, smallest scene that exercises them, one block each,
standalone-first (the production path), fused second; a block-1 crash
makes us skip block 2 instead of burning a second wedge.

Pass a block selector (1 or 2) to run one compile per process:
    python probes/probe_r3x.py 1   # trace_any_point_soft_pallas
    python probes/probe_r3x.py 2   # trace_closest_point_soft_shadow_pallas
No argument = both in order (block 2 skipped if block 1 fails).
"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    blocks = sys.argv[1:] or ["1", "2"]
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.scenes import default_camera_for, teapot_scene
    from tpurt.types import Light

    W, H = 256, 192
    host_mesh = teapot_scene(4_000)
    mesh = jax.device_put(host_mesh)
    cam = default_camera_for(host_mesh)
    acc = jax.device_put(build_wide(build_sah_lbvh(host_mesh, 14)))
    o, d = generate_rays(cam, W, H)
    ctr = 0.5 * (np.asarray(host_mesh.vertices.min(0))
                 + np.asarray(host_mesh.vertices.max(0)))
    plight = Light.point(ctr + np.float32([0.0, 3.0, 0.0]), radius=0.8)
    lp = jnp.asarray(plight.position, jnp.float32)
    rad = jnp.asarray(plight.radius, jnp.float32)
    spp = 4

    # Cached family: closest hit for the origins.
    tt, _tid, sidx = jax.jit(lambda a, o, d: trace_closest_pallas(
        a, o, d, return_sorted=True, gather_tri_id=False))(acc, o, d)
    valid = sidx >= 0
    pos = o + d * jnp.where(valid, tt, 0.0)[..., None]
    org = pos + jnp.float32([0.0, 1.0, 0.0]) * 1e-3
    org, valid = jax.device_put(np.asarray(org)), jax.device_put(
        np.asarray(valid))
    log(f"setup done; valid={int(np.asarray(valid).sum())}")

    ok1 = True
    if "1" in blocks:
        try:
            from tpurt.kernels.traverse import trace_any_point_soft_pallas
            fn = jax.jit(lambda a, og, v: trace_any_point_soft_pallas(
                a, og, v, lp, rad, spp, 7))
            t0 = time.perf_counter()
            counts = np.asarray(fn(acc, org, valid))
            log(f"psoft standalone COMPILED+RAN in "
                f"{time.perf_counter()-t0:.1f}s; count mean="
                f"{counts.mean():.3f} max={counts.max()}")
            assert counts.min() >= 0 and counts.max() <= spp
            # Statistics vs the XLA scan (different RNG; compare means).
            from tpurt.passes.shadow import shadow_pass
            from tpurt.kernels.traverse import trace_any_pallas
            gbuf = {"position": pos, "valid": valid,
                    "gnormal": jnp.broadcast_to(
                        jnp.float32([0.0, 1.0, 0.0]), pos.shape)}
            vis_scan = np.asarray(jax.jit(
                lambda a, g, k: shadow_pass(
                    lambda so, sd, stm: trace_any_pallas(a, so, sd, stm),
                    g, plight, spp, k, 1e-3))(
                        acc, gbuf, jax.random.PRNGKey(3)))
            vis_k = 1.0 - counts.astype(np.float32) / spp
            vm = np.asarray(valid)
            log(f"mean vis kernel={vis_k[vm].mean():.4f} "
                f"scan={vis_scan[vm].mean():.4f}")
        except Exception as e:  # noqa: BLE001
            ok1 = False
            log(f"psoft standalone FAILED: {type(e).__name__}: "
                f"{str(e)[:300]}")

    if "2" in blocks:
        if not ok1:
            log("skipping fused psoft (block 1 failed; helper likely wedged)")
            return
        try:
            from tpurt.kernels.traverse import (
                trace_closest_point_soft_shadow_pallas)
            fn2 = jax.jit(lambda a, o, d: trace_closest_point_soft_shadow_pallas(
                a, o, d, lp, rad, spp, 7, 1e-3))
            t0 = time.perf_counter()
            t2, s2, c2 = fn2(acc, o, d)
            c2 = np.asarray(c2)
            log(f"fused closest+psoft COMPILED+RAN in "
                f"{time.perf_counter()-t0:.1f}s; count mean={c2.mean():.3f}")
            assert c2.min() >= 0 and c2.max() <= spp
        except Exception as e:  # noqa: BLE001
            log(f"fused psoft FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("probe_r3x done")


if __name__ == "__main__":
    main()
