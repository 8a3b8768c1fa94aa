"""Round-3 probe AD: where do the attr frame's extra ~25 ms live?

probe r3ab: unfused attr frame 51.6 ms at interior 1080p, but the attr
G-buffer kernel alone was 13.5 ms (default cam; ~23 est. interior).
Suspects: (a) the 18-channel packet->image _unpack relayout, (b) the
oct-decode/normalize chain, (c) shadow raygen+trace, (d) composite.
All kernel families cached except nothing — pure decomposition probe.
"""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(fn, iters=20):
    fn()
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(r).ravel()[0]
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.camera import generate_rays
    from tpurt.kernels.traverse import (_attr_call_b, _as_packed,
                                        _attr_channels, PACKETS_PER_STEP,
                                        _ray_packets_packed)
    from tpurt.passes.gbuffer import gbuffer_attr_pass
    from tpurt.passes.shading import make_leaf_attr_rows
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    host_mesh = sponza_scene()
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    W, H = 1920, 1080
    bvh = build_sah_lbvh(host_mesh, 14)
    wide = jax.device_put(order_children_for_point(
        build_wide(bvh), jnp.asarray(cam.position)))
    at = jax.jit(make_leaf_attr_rows)(bvh, mesh)
    at0, at1 = jax.device_put(at[0]), jax.device_put(at[1])
    o, d = jax.jit(lambda: generate_rays(cam, W, H))()

    # (a) raw kernel, packet-space consume (no unpack at all).
    def raw(a, a0, a1, o, d):
        rays, p, meta = _ray_packets_packed(o, d, 3.4e38, PACKETS_PER_STEP)
        out = _attr_call_b(_as_packed(a), a0, a1, rays, 0.0, None,
                           PACKETS_PER_STEP)
        return jnp.sum(out)
    log(f"kernel raw (packet-space sum): "
        f"{timed(lambda: jax.jit(raw)(wide, at0, at1, o, d)):.2f} ms")

    # (b) + 18-channel unpack to image layout.
    def unp(a, a0, a1, o, d):
        rays, p, meta = _ray_packets_packed(o, d, 3.4e38, PACKETS_PER_STEP)
        out = _attr_call_b(_as_packed(a), a0, a1, rays, 0.0, None,
                          PACKETS_PER_STEP)
        ch = _attr_channels(out, p, meta)
        return sum(jnp.sum(v) for v in jax.tree.leaves(ch))
    log(f"kernel + unpack 18ch: "
        f"{timed(lambda: jax.jit(unp)(wide, at0, at1, o, d)):.2f} ms")

    # (c) full gbuffer_attr_pass (adds oct decode, facing, depth).
    def gba(a, a0, a1):
        g = gbuffer_attr_pass(a, (a0, a1), mesh, cam, W, H)
        return sum(jnp.sum(v) for v in jax.tree.leaves(g))
    log(f"gbuffer_attr_pass (full consume): "
        f"{timed(lambda: jax.jit(gba)(wide, at0, at1)):.2f} ms")

    # (d) image-only consume (XLA may DCE unused channels).
    def gbi(a, a0, a1):
        g = gbuffer_attr_pass(a, (a0, a1), mesh, cam, W, H)
        return jnp.sum(g["albedo"]) + jnp.sum(g["normal"].sum())
    log(f"gbuffer_attr_pass (albedo+normal only): "
        f"{timed(lambda: jax.jit(gbi)(wide, at0, at1)):.2f} ms")
    log("probe_r3ad done")


if __name__ == "__main__":
    main()
