"""Round-3 probe AE: WHY is the attr walk 2x the plain walk at the
interior view? (43 vs ~21 ms, probe r3ad.)

Three suspects, isolated with hacked kernel variants (same pallas_call
plumbing as _attr_call_b):
  V0 plain: 2-carry closest walk (baseline).
  V1 loads-only: reads the two attr rows per leaf visit, consumes them
     trivially (sum into t via a 0-weighted add), tracks only t/i —
     isolates the extra dynamic VMEM row loads.
  V2 selects-only: tracks all 18 carries + per-candidate selects, but
     sources 'attributes' from the TRIANGLE row values already loaded
     (no extra row reads) — isolates select/carry cost.
Full attr (V3) = production kernel for reference.
"""
import functools
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import tpurt.kernels.traverse as T
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.camera import generate_rays
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
    batch = T.PACKETS_PER_STEP

    def make_walk(variant):
        def walk(k, max_iters, ns_ref, tr_ref, a0_ref, a1_ref, stack_ref,
                 ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax, t_min):
            active0 = tmax > t_min
            stack_ref[0] = jnp.int32(0)
            zero = jnp.zeros(ox.shape, jnp.float32)
            n_extra = 16 if variant == "selects" else 0

            def leaf_test(leaf_id, carry):
                best_t, best_i = carry[0], carry[1]
                extra = list(carry[2:])
                row = tr_ref[pl.ds(leaf_id, 1), :]
                if variant == "loads":
                    ra0 = a0_ref[pl.ds(leaf_id, 1), :]
                    ra1 = a1_ref[pl.ds(leaf_id, 1), :]
                    # consume both rows without tracking anything
                    eps = (ra0[0, 0] + ra1[0, 0]) * 0.0
                else:
                    eps = 0.0
                base = leaf_id * k
                for j in range(k):
                    b = 9 * j
                    v0x, v0y, v0z = row[0, b], row[0, b + 1], row[0, b + 2]
                    e1x, e1y, e1z = row[0, b + 3], row[0, b + 4], row[0, b + 5]
                    e2x, e2y, e2z = row[0, b + 6], row[0, b + 7], row[0, b + 8]
                    px = dy * e2z - dz * e2y
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    ok = jnp.abs(det) >= 1e-9
                    inv_det = 1.0 / jnp.where(ok, det, 1.0)
                    tx = ox - v0x
                    ty = oy - v0y
                    tz = oz - v0z
                    u = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    v = (dx * qx + dy * qy + dz * qz) * inv_det
                    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) \
                        & (u + v <= 1.0)
                    t = jnp.where(ok, t + eps, T._BIG)
                    better = (t > t_min) & (t < best_t) & active0
                    best_t = jnp.where(better, t, best_t)
                    best_i = jnp.where(better, base + j, best_i)
                    if variant == "selects":
                        # 16 tracked values sourced from the tri row (no
                        # extra loads): mimic the production select load.
                        srcs = (u, v, u + v, e1x, e1y, e1z, e2x, e2y, e2z,
                                v0x, v0y, v0z, tx, ty, tz, det)
                        extra = [jnp.where(better, s, e)
                                 for s, e in zip(srcs, extra)]
                return tuple([best_t, best_i] + extra)

            def cond(state):
                return (state[1] > 0) & (state[0] < max_iters)

            def body(state):
                it, sp = state[0], state[1]
                carry = state[2:]
                sp = sp - 1
                node = stack_ref[sp]
                rec = ns_ref[pl.ds(node, 1), :]
                cap = jnp.where(active0, carry[0], -T._BIG)
                hits, refs, valids = [], [], []
                for c in range(8):
                    bb, ref = T._wide_child(rec, c)
                    hits.append(T._slab(rec, bb, ox, oy, oz, ix, iy, iz,
                                        t_min, cap))
                    refs.append(ref)
                    valids.append(rec[0, bb] <= rec[0, bb + 3])
                anyhit = T._child_anyhit8(hits, valids)
                for c in range(8):
                    ref = refs[c]
                    is_leaf = ref < 0
                    carry = jax.lax.cond(
                        anyhit[c] & is_leaf,
                        lambda car, r=ref: leaf_test(
                            jnp.maximum(-r - 1, 0), car),
                        lambda car: car, carry)
                    push = anyhit[c] & (~is_leaf)
                    stack_ref[sp] = jnp.where(push, ref, 0)
                    sp = sp + push.astype(jnp.int32)
                return (it + 1, sp) + tuple(carry)

            best_t0 = jnp.where(active0, tmax, -T._BIG)
            best_i0 = jnp.full(ox.shape, -1, jnp.int32)
            init = (jnp.int32(0), jnp.int32(1), best_t0, best_i0) \
                + tuple(zero for _ in range(n_extra))
            state = jax.lax.while_loop(cond, body, init)
            return state[2], state[3]

        return walk

    def make_kernel(variant):
        walk = make_walk(variant)

        def kern(k, max_iters, nb, tmin_ref, ns_ref, tr_ref, a0_ref, a1_ref,
                 rays_ref, t_out_ref, i_out_ref, stack_ref):
            t_min = tmin_ref[0]

            def per_packet(b, _):
                ox, oy, oz, dx, dy, dz, ix, iy, iz, tmax = \
                    T._packet_body_rays(rays_ref, b)
                bt, bi = walk(k, max_iters, ns_ref, tr_ref, a0_ref, a1_ref,
                              stack_ref, ox, oy, oz, dx, dy, dz,
                              ix, iy, iz, tmax, t_min)
                t_out_ref[b] = jnp.where(bi >= 0, bt, T._BIG)
                i_out_ref[b] = bi
                return 0

            jax.lax.fori_loop(0, nb, per_packet, 0, unroll=False)
        return kern

    def call(kernel, a, a0, a1, o, d):
        rays, p, meta = T._ray_packets_packed(o, d, 3.4e38, batch)
        packed = T._as_packed(a)
        pb = rays.shape[0]
        iter_cap = 2 * packed.num_wide + 64
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        ray_spec = pl.BlockSpec((batch, 10, 8, 128),
                                lambda i, *_: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((batch, 8, 128), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(pb // batch,),
            in_specs=[const_spec(packed.nodes.shape),
                      const_spec(packed.tris.shape),
                      const_spec(a0.shape), const_spec(a1.shape), ray_spec],
            out_specs=(out_spec, out_spec),
            scratch_shapes=[pltpu.SMEM((T.WIDE_STACK_DEPTH,), jnp.int32)],
        )
        fn = pl.pallas_call(
            functools.partial(kernel, packed.leaf_size, iter_cap, batch),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((pb, 8, 128), jnp.float32),
                       jax.ShapeDtypeStruct((pb, 8, 128), jnp.int32)),
            interpret=False,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(T._GRID_SEMANTICS,)),
        )
        tmin_arr = jnp.full((1,), 0.0, jnp.float32)
        t, i = fn(tmin_arr, packed.nodes, packed.tris, a0, a1, rays)
        return jnp.sum(t) + jnp.sum(i)

    for name in ("plain", "loads", "selects"):
        kern = make_kernel(name)
        f = jax.jit(lambda a, a0, a1, o, d, kern=kern: call(
            kern, a, a0, a1, o, d))
        log(f"V[{name}]: {timed(lambda: f(wide, at0, at1, o, d)):.2f} ms")
    log("probe_r3ae done")


if __name__ == "__main__":
    main()
