"""Probe M: adjudicate the t=0 occlusion delta (static SBVH 1706562 vs
clip-refit 1709710) with the NumPy brute-force oracle on the disagreeing
rays. Decides whether the native stored boxes lose true hits."""
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.clip_refit import make_clip_refit, refit_sbvh_wide
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, count_wide, round_up_bucket, \
        order_children_for_point
    from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.passes.shadow import shadow_ray_batch
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    cfg = RenderConfig(width=1920, height=1080, use_pallas=True,
                       leaf_size=LEAF)

    sah = build_sah_lbvh(host, LEAF)
    sah = jax.device_put(sah)
    nw_pad = round_up_bucket(max(count_wide(sah), 1))
    plan = jax.device_put(make_clip_refit(sah, nw_pad))
    static = build_wide(sah)
    clip0 = jax.jit(lambda b: refit_sbvh_wide(
        plan, b, b.tri_v0, b.tri_e1, b.tri_e2)[0])(sah)

    st0 = jax.jit(make_shade_table)(sah, mesh)
    gb = jax.jit(lambda a, mesh, cam, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True),
        mesh, cam, 1920, 1080, shade_table=st))
    gbuf = gb(order_children_for_point(static, cam.position), mesh, cam, st0)
    rays = jax.jit(lambda gbuf, light, b: shadow_ray_batch(
        gbuf, light, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))
    so, sd, stm = rays(gbuf, light, sah)

    def chunked_occ(accel, o, dd, tm, nchunks=8):
        """Full-array occlusion retrieval without blowing scoped vmem:
        the 1080p out block (s32[2040,8,128]) + node VMEM exceeds the
        16 MB scoped limit in one program; chunking the rays keeps each
        program's output small."""
        f = jax.jit(lambda a, o, dd, tm: trace_any_pallas(a, o, dd, tm))
        n = o.reshape(-1, 3).shape[0]
        step = -(-n // nchunks)
        step = ((step + 1023) // 1024) * 1024
        of = o.reshape(-1, 3)
        df = dd.reshape(-1, 3)
        tf = tm.ravel()
        outs = []
        for lo in range(0, n, step):
            outs.append(np.asarray(
                f(accel, of[lo:lo + step], df[lo:lo + step],
                  tf[lo:lo + step])).ravel())
        return np.concatenate(outs)[:n]

    s = chunked_occ(static, so, sd, stm)
    c = chunked_occ(clip0, so, sd, stm)
    o = np.asarray(so).reshape(-1, 3)
    d = np.asarray(sd).reshape(-1, 3)
    tm = np.asarray(stm).ravel()
    n = o.shape[0]
    s = s[:n].astype(bool)
    c = c[:n].astype(bool)
    diff = np.nonzero(s != c)[0]
    log(f"static occ {s.sum()}, clip occ {c.sum()}, diff rays {len(diff)}")
    s_only = diff[s[diff]]          # static says occluded, clip says free
    c_only = diff[c[diff]]
    log(f"static-only {len(s_only)}, clip-only {len(c_only)}")

    from tpurt.bvh.reference import brute_force_any
    sub = diff[:4096]
    t0 = time.perf_counter()
    truth = brute_force_any(host, o[sub], d[sub], t_min=0.0,
                            t_max=np.where(np.isfinite(tm[sub]), tm[sub],
                                           np.inf))
    log(f"oracle on {len(sub)} rays: {time.perf_counter()-t0:.1f} s")
    agree_s = int((truth == s[sub]).sum())
    agree_c = int((truth == c[sub]).sum())
    log(f"oracle agrees with static on {agree_s}/{len(sub)}, "
        f"with clip-refit on {agree_c}/{len(sub)}")
    log("probe_r3m done")


if __name__ == "__main__":
    main()
