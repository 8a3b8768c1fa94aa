"""Probe r5i (TPU): the production rebuild-mode FRAME with the r5h fix —
order_children=False on clustered rebuilds (the fused any-hit phase loses
more from near-camera-first ordering than the closest-hit phase gains).
Measures the bench's exact _reb_frame program both ways.
"""

import os
import sys
import time

os.environ.setdefault("AXON_LIBTPU_OVERRIDES",
                      "--xla_tpu_scoped_vmem_limit_kib=65536")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force(r):
    r = r[0] if isinstance(r, tuple) else r
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


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpurt_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpurt.app import _rebuild_fused, render_frame_fn
    from tpurt.bvh.lbvh import auto_split_blocks, build_lbvh
    from tpurt.bvh.wide import count_wide, round_up_bucket
    from tpurt.scenes import sponza_interior_camera, sponza_scene
    from tpurt.types import Light, RenderConfig

    leaf = 14
    mesh = jax.device_put(sponza_scene(260_000))
    cam = sponza_interior_camera()
    light = Light.directional((0.25, 0.9, 0.2))
    t = int(np.asarray(mesh.indices.shape[0]))
    msp = auto_split_blocks(t, leaf)
    bq = build_lbvh(mesh.vertices, mesh.indices, leaf_size=leaf,
                    split_blocks=msp)
    nwq = round_up_bucket(max(count_wide(bq, mode="area"), 1))
    base = RenderConfig(width=1920, height=1080, leaf_size=leaf,
                        use_pallas=True, gbuffer="ray")

    for ordered in (False, True):
        cfg = dataclasses.replace(base, order_children=ordered)

        def _reb_frame(v, i, m, c, key):
            _, w, _, _, at, _ = _rebuild_fused(
                v, i, m, leaf, nwq, tables="attr", textured=False,
                collapse="area", split_blocks=msp)
            return jnp.sum(render_frame_fn(
                w, m, c, (light,), key, cfg, attr_tables=at)["image"])
        rfj = jax.jit(_reb_frame)
        kk = jax.random.PRNGKey(0)
        ms = timed(lambda: rfj(mesh.vertices, mesh.indices, mesh, cam, kk),
                   12) * 1e3
        log(f"rebuild frame order_children={ordered}: {ms:.2f} ms")


if __name__ == "__main__":
    main()
