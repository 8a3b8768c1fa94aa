"""Probe O: does PRE-SPLITTING big triangles fix the Morton tree's trace
quality? (config-2 rebuild: the per-frame tree must trace well AND build
cheap; SBVH quality comes from spatial splits, which a Morton build
forfeits. Pre-splitting bakes splits into the primitive list once.)

Host: iteratively split the largest-AABB triangle at its longest edge
midpoint until the reference budget is hit. TPU: trace the bench shadow
workload on implicit/karras trees over the split lists vs the originals.
"""
import heapq
import time

import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=40, batches=4):
    _force(fn())
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        _force(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def presplit(v0, e1, e2, budget_refs):
    """Split largest-half-area triangles at longest-edge midpoints until
    len == budget_refs. Returns (v0, e1, e2) arrays of the split list."""
    tris = [(v0[i], e1[i], e2[i]) for i in range(len(v0))]

    def prio(t):
        a, b, c = t[0], t[0] + t[1], t[0] + t[2]
        lo = np.minimum(np.minimum(a, b), c)
        hi = np.maximum(np.maximum(a, b), c)
        d = hi - lo
        return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    heap = [(-prio(t), i) for i, t in enumerate(tris)]
    heapq.heapify(heap)
    while len(tris) < budget_refs:
        _, i = heapq.heappop(heap)
        a, b, c = tris[i][0], tris[i][0] + tris[i][1], tris[i][0] + tris[i][2]
        # longest edge: ab, bc, or ca
        lab = np.sum((b - a) ** 2)
        lbc = np.sum((c - b) ** 2)
        lca = np.sum((a - c) ** 2)
        if lab >= lbc and lab >= lca:
            m = 0.5 * (a + b)
            t1, t2 = (a, m - a, c - a), (m, b - m, c - m)
        elif lbc >= lca:
            m = 0.5 * (b + c)
            t1, t2 = (a, b - a, m - a), (a, m - a, c - a)
        else:
            m = 0.5 * (c + a)
            t1, t2 = (a, b - a, m - a), (m, b - m, c - m)
        tris[i] = t1
        j = len(tris)
        tris.append(t2)
        heapq.heappush(heap, (-prio(t1), i))
        heapq.heappush(heap, (-prio(t2), j))
    sv0 = np.stack([t[0] for t in tris])
    se1 = np.stack([t[1] for t in tris])
    se2 = np.stack([t[2] for t in tris])
    return sv0.astype(np.float32), se1.astype(np.float32), \
        se2.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.implicit import build_wide_implicit_corners
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import (build_wide, count_wide, round_up_bucket,
                                widen_lbvh, order_children_for_point)
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

    sah = jax.device_put(build_sah_lbvh(host, LEAF))
    sbvh = build_wide(sah, from_node_boxes=True)
    st0 = jax.jit(make_shade_table)(sah, mesh)
    gb = jax.jit(lambda a, mesh, cam, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True),
        mesh, cam, 1920, 1080, shade_table=st))
    gbuf = gb(order_children_for_point(sbvh, cam.position), mesh, cam, st0)
    valid = int(np.asarray(gbuf["valid"]).sum())
    rays = jax.jit(lambda gbuf, light, b: shadow_ray_batch(
        gbuf, light, cfg.shadow_bias, None,
        scene_bounds=(b.root_min, b.root_max)))
    so, sd, stm = rays(gbuf, light, sah)
    log(f"valid rays: {valid}")

    shade = jax.jit(lambda a, o, d, tm: jnp.sum(
        trace_any_pallas(a, o, d, tm).astype(jnp.int32)))

    def shadow_ms(accel, label, reps=64):
        t = timed(lambda: shade(accel, so, sd, stm), reps)
        occ = int(shade(accel, so, sd, stm))
        log(f"shadow [{label}]: {t*1e3:.2f} ms -> "
            f"{valid/t/1e6:.1f} Mrays/s (occ {occ})")
        return t

    shadow_ms(sbvh, "sbvh (control)")

    # host primitive data
    hv = np.asarray(host.vertices)
    hi = np.asarray(host.indices)
    v0 = hv[hi[:, 0]]
    e1 = hv[hi[:, 1]] - v0
    e2 = hv[hi[:, 2]] - v0
    n = len(v0)
    log(f"tris={n}")

    for budget in (1.15, 1.3):
        t0 = time.perf_counter()
        sv0, se1, se2 = presplit(v0, e1, e2, int(n * budget))
        log(f"presplit x{budget}: {len(sv0)} refs, "
            f"{(time.perf_counter()-t0)*1e3:.0f} ms host")
        d0, d1, d2 = map(jax.device_put, (sv0, se1, se2))
        wide = jax.jit(lambda a, b, c: build_wide_implicit_corners(
            a, b, c, leaf_size=LEAF))(d0, d1, d2)
        t = timed(lambda: _force(jnp.sum(jax.jit(
            lambda a, b, c: build_wide_implicit_corners(
                a, b, c, leaf_size=LEAF).nodes)(d0, d1, d2))), 20)
        log(f"  implicit build x{budget}: {t*1e3:.2f} ms "
            f"(nw={wide.num_wide})")
        shadow_ms(wide, f"implicit presplit x{budget}")

    # unsplit controls
    cw = jax.jit(lambda a, b, c: build_wide_implicit_corners(
        a, b, c, leaf_size=LEAF))(*map(jax.device_put, (v0, e1, e2)))
    shadow_ms(cw, "implicit unsplit")
    kb = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))(
        mesh.vertices, mesh.indices)
    kw = widen_lbvh(kb, nw_pad=round_up_bucket(max(count_wide(kb), 1)))
    shadow_ms(kw, "karras unsplit")
    log("probe_r3o done")


main()
