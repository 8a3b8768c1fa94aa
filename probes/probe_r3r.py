"""Probe R: merged-gather G-buffer (tri_id/uv in the shade row) vs the
two-gather path, full-consumption reductions (no DCE)."""
import time
import numpy as np


def log(*a):
    print(*a, flush=True)


def _force(r):
    return np.asarray(r).ravel()[0]


def timed(fn, reps=20, batches=4):
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
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.sah import build_sah_lbvh
    from tpurt.bvh.wide import build_wide, order_children_for_point
    from tpurt.kernels.traverse import trace_closest_pallas
    from tpurt.passes.gbuffer import gbuffer_pass
    from tpurt.passes.shading import make_shade_table
    from tpurt.scenes import sponza_interior_camera, sponza_scene

    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)
    cam = sponza_interior_camera()
    sah = jax.device_put(build_sah_lbvh(host, LEAF))
    accel = order_children_for_point(build_wide(sah, from_node_boxes=True),
                                     cam.position)
    st0 = jax.jit(make_shade_table)(sah, mesh)

    def consume(g):
        return (jnp.sum(g["normal"]) + jnp.sum(g["albedo"])
                + jnp.sum(g["position"]) + jnp.sum(g["tri_id"])
                + jnp.sum(jnp.where(g["valid"], 1.0, 0.0)))

    for name, gti in (("two-gather", True), ("merged", False)):
        gbs = jax.jit(lambda a, m, c, st, gti=gti: consume(
            gbuffer_pass(lambda o, d: trace_closest_pallas(
                a, o, d, return_sorted=True, gather_tri_id=gti),
                m, c, 1920, 1080, shade_table=st)))
        t = timed(lambda: gbs(accel, mesh, cam, st0))
        log(f"gbuffer full-consume [{name}]: {t*1e3:.2f} ms")

    # parity of the two paths
    g1 = jax.jit(lambda a, m, c, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True),
        m, c, 1920, 1080, shade_table=st))(accel, mesh, cam, st0)
    g2 = jax.jit(lambda a, m, c, st: gbuffer_pass(
        lambda o, d: trace_closest_pallas(a, o, d, return_sorted=True,
                                          gather_tri_id=False),
        m, c, 1920, 1080, shade_table=st))(accel, mesh, cam, st0)
    mism = int(np.asarray(jnp.sum(jnp.where(
        g1["tri_id"] != g2["tri_id"], 1, 0))))
    nd = float(np.asarray(jnp.max(jnp.abs(g1["normal"] - g2["normal"]))))
    log(f"parity: tri_id mismatches {mism}, max|dn|={nd:.2e}")
    log("probe_r3r done")


main()
