"""Round-3 probe V: deferred (z16) raster G-buffer vs v2 self-shading
raster vs ray-cast, Sponza 1080p. Also splits binning vs kernel cost for
both raster variants. Kernel ops are the same family as the known-good
v2 raster kernel (arith + cond + fori + DMA)."""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=32, batches=4):
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
    from tpurt.passes.gbuffer import gbuffer_raster_pass
    from tpurt.passes.shading import make_shade_table_orig
    from tpurt.raster.setup import bin_rows, default_cap_rows
    from tpurt.kernels.raster import rasterize_rows, rasterize_rows16
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    W, H = 1920, 1080
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    st_orig = jax.jit(make_shade_table_orig)(mesh)
    cap = default_cap_rows(host_mesh.num_triangles)
    log(f"tris={host_mesh.num_triangles} cap_rows={cap}")

    # Binning-only, both formats (scalar-fused).
    for fmt in ("full", "z16"):
        bf = jax.jit(lambda m, c, fmt=fmt: jnp.sum(
            bin_rows(c, m, W, H, cap, fmt=fmt).pair_rows[:, 10]))
        t = timed(lambda: bf(mesh, cam))
        log(f"bin_rows[{fmt}]: {t*1e3:.2f} ms")

    # Kernel-only (bins precomputed on device).
    bins32 = jax.jit(lambda m, c: bin_rows(c, m, W, H, cap))(mesh, cam)
    bins16 = jax.jit(lambda m, c: bin_rows(c, m, W, H, cap, fmt="z16"))(
        mesh, cam)
    k32 = jax.jit(lambda b: jnp.sum(rasterize_rows(b, W, H)[1]))
    t = timed(lambda: k32(bins32), reps=16)
    log(f"raster kernel v2(full): {t*1e3:.2f} ms")
    k16 = jax.jit(lambda b: jnp.sum(rasterize_rows16(b, W, H)[3]))
    t = timed(lambda: k16(bins16), reps=16)
    log(f"raster kernel v3(z16): {t*1e3:.2f} ms")

    # Full pass, full-consume reduction (all G-buffer channels).
    def consume(g):
        return (jnp.sum(g["normal"]) + jnp.sum(g["albedo"])
                + jnp.sum(g["position"]) + jnp.sum(g["tri_id"])
                + jnp.sum(jnp.where(g["valid"], 1.0, 0.0)))

    g2 = jax.jit(lambda m, c, s: consume(
        gbuffer_raster_pass(m, c, W, H, s)))
    t2 = timed(lambda: g2(mesh, cam, st_orig), reps=16)
    log(f"gbuffer raster v2 total: {t2*1e3:.2f} ms")
    g3 = jax.jit(lambda m, c, s: consume(
        gbuffer_raster_pass(m, c, W, H, s, deferred=True)))
    t3 = timed(lambda: g3(mesh, cam, st_orig), reps=16)
    log(f"gbuffer raster v3 deferred total: {t3*1e3:.2f} ms")
    # Parity spot check on hardware.
    a = jax.jit(lambda m, c, s: gbuffer_raster_pass(m, c, W, H, s))(
        mesh, cam, st_orig)
    b = jax.jit(lambda m, c, s: gbuffer_raster_pass(
        m, c, W, H, s, deferred=True))(mesh, cam, st_orig)
    log(f"overflow v2={bool(np.asarray(a['raster_overflow']))} "
        f"v3={bool(np.asarray(b['raster_overflow']))}")
    av, bv = np.asarray(a["valid"]), np.asarray(b["valid"])
    log(f"valid v2={av.sum()} v3={bv.sum()} mismatch={(av != bv).mean():.2e}")
    both = av & bv
    same = (np.asarray(a["tri_id"]) == np.asarray(b["tri_id"]))[both]
    dn = np.abs(np.asarray(a["normal"]) - np.asarray(b["normal"])
                ).max(axis=-1)[both]
    log(f"same tri {same.mean():.5f}; normal p99 {np.percentile(dn, 99):.2e}")
    # Decode-cost isolation: how much of the G-buffer's post-kernel
    # overhead is the XLA decode chain (oct decode + normalize + unpack
    # + position fma) vs the row gather itself?
    import jax.random as jr
    tid = jr.randint(jr.PRNGKey(1), (H, W), 0, host_mesh.num_triangles)
    u = jr.uniform(jr.PRNGKey(2), (H, W))
    v = jr.uniform(jr.PRNGKey(3), (H, W)) * (1.0 - u)
    valid = jnp.ones((H, W), bool)
    gath = jax.jit(lambda st, tid: jnp.sum(st[tid]))
    t = timed(lambda: gath(st_orig, tid))
    log(f"shade-row gather alone (2M rows): {t*1e3:.2f} ms")
    rows_g = jax.jit(lambda st, tid: st[tid])(st_orig, tid)

    def decode(rows, u, v, valid):
        from tpurt.passes.shading import shade_from_table_uv
        at = shade_from_table_uv(rows, u, v, valid)
        pos = rows[..., 0:3] + u[..., None] * rows[..., 3:6] \
            + v[..., None] * rows[..., 6:9]
        return (jnp.sum(at["normal"]) + jnp.sum(at["gnormal"])
                + jnp.sum(at["albedo"]) + jnp.sum(pos))
    dec = jax.jit(decode)
    t = timed(lambda: dec(rows_g, u, v, valid))
    log(f"decode chain alone: {t*1e3:.2f} ms")

    # Full-frame comparison: ray vs raster vs raster-deferred G-buffer
    # (static SBVH accel, one directional light — the config-1/2 frame).
    from tpurt.app import render_frame_fn
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.passes.shading import make_shade_table
    from tpurt.types import Light, RenderConfig
    light = Light.directional((0.25, 0.9, 0.2))
    sbvh = build_sah_lbvh(host_mesh, 14)
    wide = jax.device_put(build_wide(sbvh))  # host-sync count; not jittable
    st = jax.jit(make_shade_table)(sbvh, mesh)
    key = jax.random.PRNGKey(0)
    for name, kw in (("ray", dict(gbuffer="ray")),
                     ("raster", dict(gbuffer="raster")),
                     ("raster-deferred", dict(gbuffer="raster",
                                              raster_deferred=True))):
        cfg = RenderConfig(width=W, height=H, leaf_size=14, **kw)
        fr = jax.jit(lambda a, m, c, k, s, so, cfg=cfg: jnp.sum(
            render_frame_fn(a, m, c, (light,), k, cfg, shade_table=s,
                            shade_table_orig=so)["image"]))
        try:
            t = timed(lambda: fr(wide, mesh, cam, key, st, st_orig),
                      reps=16)
            log(f"frame[{name}]: {t*1e3:.2f} ms")
        except Exception as e:  # noqa: BLE001
            log(f"frame[{name}] FAILED: {type(e).__name__}: {str(e)[:160]}")
    log("probe_r3v done")


if __name__ == "__main__":
    main()
