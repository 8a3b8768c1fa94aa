"""Probe N: fused rebuild cost after co-sorted-payload build_lbvh."""
import time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import sys
    sys.path.insert(0, "/root/repo")
    from tpurt.bvh.lbvh import build_lbvh
    from tpurt.bvh.wide import count_wide, round_up_bucket, widen_lbvh
    from tpurt.scenes import sponza_scene
    LEAF = 14
    host = sponza_scene(260_000)
    mesh = jax.device_put(host)

    def timed(fn, reps):
        fn(); np.asarray(fn())
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn()
            np.asarray(r)
            best = min(best, (time.perf_counter() - t0) / reps)
        return best * 1e3

    bvh = jax.jit(lambda v, i: build_lbvh(v, i, leaf_size=LEAF))(
        mesh.vertices, mesh.indices)
    nw_pad = round_up_bucket(max(count_wide(bvh), 1))
    build_s = jax.jit(lambda v, i: jnp.sum(
        build_lbvh(v, i, leaf_size=LEAF).nodes_box))
    print("build alone: %.2f ms" %
          timed(lambda: build_s(mesh.vertices, mesh.indices), 20), flush=True)
    reb = jax.jit(lambda v, i: jnp.sum(widen_lbvh(
        build_lbvh(v, i, leaf_size=LEAF), nw_pad=nw_pad).nodes))
    print("fused rebuild (build+collapse): %.2f ms" %
          timed(lambda: reb(mesh.vertices, mesh.indices), 20), flush=True)
    print("probe_r3n done", flush=True)

main()
