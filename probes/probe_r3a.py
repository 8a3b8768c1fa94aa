"""Round-3 design probes (run on the axon TPU, nohup-detached):

P1: does pltpu.prng_random_bits compile + run in a Mosaic kernel here?
P2: does jnp.take_along_axis (per-lane dynamic gather) lower in Mosaic?
    (sublane-axis gather of a (N,128) VMEM table with (8,128) indices)
P3: where do the ~5 ms/sample of soft-shadow ray-gen go?
    (RNG / cone math / packing / kernel, measured with the honest
    fused-scalar protocol from bench.py)

Each probe is fault-isolated; results print to stdout line by line.
"""
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
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


def p1_kernel_prng():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k(seed_ref, o_ref):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits((8, 128)), jnp.uint32)
        # u in [0,1): 23 random mantissa bits onto exponent 127 -> [1,2)
        u = (bits >> 9) | jnp.uint32(0x3F800000)
        o_ref[...] = pltpu.bitcast(u, jnp.float32) - 1.0

    f = pl.pallas_call(
        k, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32))
    out = np.asarray(f(jnp.array([1234], jnp.int32)))
    log(f"P1 prng_random_bits: OK mean={out.mean():.4f} (want ~0.5) "
        f"std={out.std():.4f} (want ~0.289) "
        f"distinct_rows={len({out[i].tobytes() for i in range(32)})}/32")


def p2_kernel_gather():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = 8  # one vreg of sublanes: does in-vreg sublane gather lower?

    def k(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)

    table = jnp.arange(N * 128, dtype=jnp.float32).reshape(N, 128)
    idx = jnp.asarray(np.random.default_rng(0).integers(0, N, (8, 128)),
                      jnp.int32)
    f = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    got = np.asarray(f(table, idx))
    want = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=0)
    log(f"P2 take_along_axis axis=0 (N={N}): "
        f"{'OK exact' if np.array_equal(got, want) else 'WRONG VALUES'}")


def p2b_kernel_gather_big():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Build-kernel shape: table is the sorted leaf-code array folded to
    # (n/128, 128); per-lane gather needs LANE-crossing -> probe a
    # (rows, 128) table gathered with FLAT indices decomposed as
    # (row, lane): row select via take_along_axis on axis 0 after a lane
    # broadcast trick is not enough; instead probe axis=1 (lane gather).
    def k(t_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)

    table = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, (8, 128)),
                      jnp.int32)
    f = pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    got = np.asarray(f(table, idx))
    want = np.take_along_axis(np.asarray(table), np.asarray(idx), axis=1)
    log(f"P2b take_along_axis axis=1 (lane gather): "
        f"{'OK exact' if np.array_equal(got, want) else 'WRONG VALUES'}")


def p3_soft_breakdown():
    import jax
    import jax.numpy as jnp
    from tpurt.app import make_tracers
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import build_wide
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shadow import shadow_pass, shadow_ray_batch
    from tpurt.kernels.traverse import trace_closest_pallas, to_packets
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H, leaf_size=14)
    host_mesh = sponza_scene(260_000)
    mesh = jax.device_put(host_mesh)
    cam = sponza_interior_camera()
    sah = build_sah_lbvh(host_mesh, 14)
    bvh = jax.device_put(sah) if sah is not None else \
        build_lbvh(mesh.vertices, mesh.indices, leaf_size=14)
    wide = build_wide(bvh)
    _, trace_any = make_tracers(cfg)
    gb = jax.jit(lambda a, m, c: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d), m, c, W, H))
    gbuf = gb(wide, mesh, cam)
    sun = Light.sun((0.25, 0.9, 0.2), angular_radius_deg=2.5)

    # (a) full soft spp=8 (the round-2 number)
    sp8 = jax.jit(lambda a, g, k: jnp.sum(shadow_pass(
        lambda o, d, tm: trace_any(a, o, d, tm), g, sun, 8, k, 1e-3,
        scene_bounds=(bvh.root_min, bvh.root_max))))
    t = timed(lambda: sp8(wide, gbuf, jax.random.PRNGKey(1)), 8)
    log(f"P3a soft spp=8 full: {t*1e3:.2f} ms")

    # (b) ray-gen only, spp=8 scan, trace replaced by a trivial reduce
    def gen_only(g, key):
        def sample(acc, s):
            u = jax.random.uniform(jax.random.fold_in(key, s), (H, W, 2))
            o, d, tm = shadow_ray_batch(g, sun, 1e-3, u,
                                        scene_bounds=(bvh.root_min,
                                                      bvh.root_max))
            p = to_packets(tm)  # include the packing layout transform
            return acc + jnp.sum(o[..., 0]) + jnp.sum(d[..., 1]) + jnp.sum(p), None
        acc, _ = jax.lax.scan(sample, jnp.float32(0), jnp.arange(8))
        return acc
    t = timed(lambda: jax.jit(gen_only)(gbuf, jax.random.PRNGKey(1)), 8)
    log(f"P3b ray-gen+pack only spp=8: {t*1e3:.2f} ms")

    # (c) RNG only
    def rng_only(key):
        def sample(acc, s):
            u = jax.random.uniform(jax.random.fold_in(key, s), (H, W, 2))
            return acc + jnp.sum(u), None
        acc, _ = jax.lax.scan(sample, jnp.float32(0), jnp.arange(8))
        return acc
    t = timed(lambda: jax.jit(rng_only)(jax.random.PRNGKey(1)), 8)
    log(f"P3c threefry RNG only spp=8: {t*1e3:.2f} ms")

    # (d) hard shadow x8 via scan with PRE-generated dirs (hoisted variant)
    def hoisted(g, a, key):
        u_all = jax.random.uniform(key, (8, H, W, 2))
        def sample(acc, u):
            o, d, tm = shadow_ray_batch(g, sun, 1e-3, u,
                                        scene_bounds=(bvh.root_min,
                                                      bvh.root_max))
            occ = trace_any(a, o, d, tm)
            return acc + jnp.sum(occ.astype(jnp.int32)), None
        acc, _ = jax.lax.scan(sample, jnp.int32(0), u_all)
        return acc
    t = timed(lambda: jax.jit(hoisted)(gbuf, wide, jax.random.PRNGKey(1)), 8)
    log(f"P3d soft spp=8 RNG hoisted out of scan: {t*1e3:.2f} ms")

    # (e) pure trace floor: hard shadow batch traced 8x (no per-sample gen)
    o, d, tm = jax.jit(lambda g: shadow_ray_batch(
        g, sun, 1e-3, None,
        scene_bounds=(bvh.root_min, bvh.root_max)))(gbuf)
    def trace8(a, o, d, tm):
        def sample(acc, s):
            occ = trace_any(a, o, d, tm)
            return acc + jnp.sum(occ.astype(jnp.int32)) + s * 0, None
        acc, _ = jax.lax.scan(sample, jnp.int32(0), jnp.arange(8))
        return acc
    t = timed(lambda: jax.jit(trace8)(wide, o, d, tm), 8)
    log(f"P3e trace x8 floor (same rays): {t*1e3:.2f} ms")


if __name__ == "__main__":
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    for name in sys.argv[1:] or ["p1", "p2", "p2b", "p3"]:
        fn = globals()[f"{name}_kernel_prng" if name == "p1" else
                       f"{name}_kernel_gather" if name == "p2" else
                       f"{name}_kernel_gather_big" if name == "p2b" else
                       f"{name}_soft_breakdown"]
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}")
    log("probe_r3a done")
