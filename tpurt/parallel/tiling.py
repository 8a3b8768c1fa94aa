"""Multi-chip scaling: pixel-tile data parallelism over a device mesh.

The reference is single-GPU; its only parallelism is SIMT threads in a
dispatch (SURVEY.md §2.4). The TPU-native scaling story is embarrassingly
parallel DP over the pixel grid: shard image rows across a 1-D mesh axis
("tiles"), replicate scene + BVH on every chip, render each shard locally,
and let the output sharding reassemble the frame. The only collective is the
implicit all-gather when the caller consumes the image — rays are
independent, so no ring/psum machinery is needed (SURVEY.md §5).

Soft-shadow RNG folds in the mesh axis index so shards draw decorrelated
jitter.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..bvh.lbvh import LBVH
from ..camera import generate_rays
from ..passes.composite import composite_pass
from ..passes.gbuffer import shade_attributes
from ..passes.shadow import shadow_pass
from ..types import Camera, Light, Mesh as TriMesh, RenderConfig
from ..camera import view_depth


def make_tile_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("tiles",))


def vma_check_enabled(cfg: "RenderConfig") -> bool:
    """Whether the sharded render runs with ``check_vma=True``.

    True for the pure-JAX path and for compiled (TPU) Pallas kernels. The
    ONE excluded combination is Pallas INTERPRET mode (CPU testing): JAX's
    HLO interpreter does not propagate varying-manual-axes onto
    kernel-internal values, so any interpret pallas_call under a
    ``check_vma=True`` shard_map fails with "Primitive ... requires varying
    manual axes to match". Re-verified broken on jax 0.9.0; minimal repro
    lives in tests/test_sharding.py::test_vma_interpret_pallas_canary,
    which is a STRICT xfail — when a JAX upgrade fixes the interpreter,
    that test xpasses and this exclusion should be deleted."""
    from ..kernels.traverse import _compiled_backend
    return not (cfg.use_pallas and not _compiled_backend())


def _local_frame(trace_closest, trace_any, tri_mesh: TriMesh, cam: Camera,
                 lights, key, cfg: RenderConfig, bvh: LBVH,
                 origins, dirs) -> jnp.ndarray:
    """Render the local row-shard. Runs inside shard_map: everything except
    (origins, dirs) is replicated."""
    key = jax.random.fold_in(key, jax.lax.axis_index("tiles"))
    t, tri_id = trace_closest(bvh, origins, dirs)
    valid = tri_id >= 0
    t_safe = jnp.where(valid, t, 0.0)
    position = origins + dirs * t_safe[..., None]
    attrs = shade_attributes(tri_mesh, tri_id, position, valid)
    facing = jnp.sign(-jnp.sum(attrs["gnormal"] * dirs, axis=-1,
                               keepdims=True))
    facing = jnp.where(facing == 0, 1.0, facing)
    gbuf = {
        "position": position,
        "normal": attrs["normal"] * facing,
        "gnormal": attrs["gnormal"] * facing,
        "albedo": attrs["albedo"],
        "depth": view_depth(cam, position, valid),
        "t": t,
        "tri_id": tri_id,
        "valid": valid,
        "view_dir": dirs,
    }
    img = None
    for li, light in enumerate(lights):
        mask = shadow_pass(lambda o, d, tm: trace_any(bvh, o, d, tm), gbuf,
                           light, cfg.spp, jax.random.fold_in(key, li),
                           cfg.shadow_bias,
                           scene_bounds=(bvh.root_min, bvh.root_max))
        contrib = composite_pass(gbuf, mask, light,
                                 cfg.ambient if li == 0 else 0.0,
                                 cfg.background if li == 0 else (0, 0, 0))
        if img is None:
            img = contrib
        else:
            img = jnp.where(gbuf["valid"][..., None], img + contrib, img)
    return img


def render_frame_sharded(bvh: LBVH, tri_mesh: TriMesh, cam: Camera,
                         lights, key, cfg: RenderConfig,
                         mesh: Optional[Mesh] = None) -> jnp.ndarray:
    """Render one frame with image rows sharded over the mesh's "tiles" axis.

    Returns the assembled f32[H, W, 3] image (sharded jax.Array; converting
    to numpy performs the final gather).
    """
    if mesh is None:
        mesh = make_tile_mesh()
    n = mesh.devices.size
    if isinstance(lights, Light):
        lights = (lights,)
    lights = tuple(lights)

    h, w = cfg.height, cfg.width
    hpad = -(-h // n) * n
    origins, dirs = generate_rays(cam, w, h)
    if hpad != h:
        origins = jnp.concatenate(
            [origins, jnp.zeros((hpad - h, w, 3), origins.dtype)])
        dirs = jnp.concatenate(
            [dirs, jnp.ones((hpad - h, w, 3), dirs.dtype)])

    from ..app import make_tracers
    trace_closest, trace_any = make_tracers(cfg)

    local = partial(_local_frame, trace_closest, trace_any)
    fn = jax.shard_map(
        lambda tm, c, ls, k, bv, o, d: local(tm, c, ls, k, cfg, bv, o, d),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("tiles"), P("tiles")),
        out_specs=P("tiles"),
        check_vma=vma_check_enabled(cfg),  # see the helper's docstring
    )
    img = fn(tri_mesh, cam, lights, key, bvh, origins, dirs)
    return img[:h]


def device_put_replicated(tree, mesh: Mesh):
    """Upload scene data replicated across the mesh (the multi-chip analogue
    of the reference's staging-buffer upload)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
