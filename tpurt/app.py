"""Renderer: the application shell / frame loop.

TPU-native equivalent of ``class RayTracedShadowsApp`` in
Source/RayTracedShadows.cpp [RECALL]: owns the scene resources (device
arrays), builds the acceleration structure, and records the three passes per
frame — except here the "passes" are one jitted function and the "resources"
are jax.Arrays. Headless: frames are returned as arrays / written as PNGs
instead of presented to a swapchain.

Mode axis (BASELINE configs):
  static  — build once, trace every frame (reference behavior)
  rebuild — full LBVH rebuild every frame (config 2)
  refit   — per-frame AABB refit for deforming meshes (config 4), with an
            automatic SAH-degradation rebuild policy
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .bvh.lbvh import LBVH, build_lbvh, refit_lbvh, sah_cost
from .bvh.wide import build_wide
from .bvh import traverse as jax_traverse
from .passes.composite import accumulate, composite_pass
from .passes.gbuffer import gbuffer_pass
from .passes.shadow import shadow_pass
from .types import Camera, Light, Mesh, RenderConfig
from .utils.metrics import FrameStats, Timer, mrays_per_s


def make_tracers(cfg: RenderConfig):
    """(trace_closest, trace_any) as functions of (bvh, rays...).

    use_pallas selects the Pallas packet kernel; the pure-JAX path is the
    always-available fallback (the analogue of the reference's compute
    fallback next to the NV-RT pipeline, SURVEY.md §3.5).
    """
    if cfg.use_pallas:
        from .kernels.traverse import trace_any_pallas, trace_closest_pallas

        def closest(bvh, o, d):
            return trace_closest_pallas(bvh, o, d, cfg=cfg)

        def any_(bvh, o, d, t_max):
            return trace_any_pallas(bvh, o, d, t_max, cfg=cfg)
    else:
        def closest(bvh, o, d):
            return jax_traverse.traverse(bvh, o, d, t_min=0.0, any_hit=False)

        def any_(bvh, o, d, t_max):
            _, tid = jax_traverse.traverse(bvh, o, d, t_min=0.0, t_max=t_max,
                                           any_hit=True)
            return tid >= 0

    if cfg.sort_rays:
        from .passes.sort import make_sorted_tracer

        raw_any = any_

        def any_(bvh, o, d, t_max):  # noqa: F811 - deliberate wrap
            sorted_tracer = make_sorted_tracer(
                lambda so, sd, stm: raw_any(bvh, so, sd, stm),
                bvh.root_min, bvh.root_max)
            return sorted_tracer(o, d, t_max)

    return closest, any_


@partial(jax.jit, static_argnames=("cfg",))
def render_frame_fn(bvh: LBVH, mesh: Mesh, cam: Camera,
                    lights: Sequence[Light], key: jax.Array,
                    cfg: RenderConfig,
                    shade_table=None) -> Dict[str, jnp.ndarray]:
    """One fused frame: G-buffer -> per-light shadow batches -> composite."""
    num_lights = len(lights)
    trace_closest, trace_any = make_tracers(cfg)
    from .bvh.wide import WideBVH, order_children_for_point
    gb_accel = bvh
    if isinstance(bvh, WideBVH):
        # Near-first child ordering w.r.t. the camera: primary-ray packets
        # pop near children first so per-lane best_t culls the far ones.
        gb_accel = order_children_for_point(bvh, cam.position)
    if shade_table is not None and cfg.use_pallas:
        from .kernels.traverse import trace_closest_pallas

        def tracer(o, d):
            return trace_closest_pallas(gb_accel, o, d, cfg=cfg,
                                        return_sorted=True)
    else:
        def tracer(o, d):
            return trace_closest(gb_accel, o, d)
    gbuf = gbuffer_pass(tracer, mesh, cam, cfg.width, cfg.height,
                        shade_table=shade_table if cfg.use_pallas else None)
    shadows = []
    for li in range(num_lights):
        lkey = jax.random.fold_in(key, li)
        shadows.append(shadow_pass(lambda o, d, tm: trace_any(bvh, o, d, tm),
                                   gbuf, lights[li], cfg.spp, lkey,
                                   cfg.shadow_bias))
    # Composite: sum of per-light direct terms + one ambient term.
    img = composite_pass(gbuf, shadows[0], lights[0], cfg.ambient,
                         cfg.background)
    for li in range(1, num_lights):
        extra = composite_pass(gbuf, shadows[li], lights[li], 0.0,
                               (0.0, 0.0, 0.0))
        img = jnp.where(gbuf["valid"][..., None], img + extra, img)
    out = {"image": img, "shadow": jnp.stack(shadows), **gbuf}
    return out


class Renderer:
    """Owns scene + BVH and renders frames. See module docstring."""

    def __init__(self, mesh: Mesh, camera: Camera,
                 lights: Union[Light, Sequence[Light]],
                 config: RenderConfig = RenderConfig(),
                 mode: str = "static",
                 rebuild_threshold: float = 1.6,
                 cache_dir: Optional[str] = None):
        if isinstance(lights, Light):
            lights = [lights]
        assert mode in ("static", "rebuild", "refit")
        config = self._check_vmem_budget(config, mesh)
        self.config = config
        self.mode = mode
        self.rebuild_threshold = rebuild_threshold
        self.camera = camera
        self.lights = list(lights)
        self.mesh = jax.device_put(mesh)
        self._build_jit = jax.jit(partial(build_lbvh,
                                          leaf_size=config.leaf_size))
        self._refit_jit = jax.jit(refit_lbvh)
        self.frame_index = 0
        self.accum: Optional[jnp.ndarray] = None
        self.stats = FrameStats(width=config.width, height=config.height,
                                spp=config.spp, num_lights=len(self.lights),
                                mode=mode)
        timer = Timer()
        with timer.section("build", None):
            self.bvh = self._build_or_load_cached(mesh, cache_dir)
            self.accel = self._make_accel()
        self.stats.build_ms = timer.ms["build"]
        self._base_cost = float(sah_cost(self.bvh))

    def _build_or_load_cached(self, host_mesh: Mesh,
                              cache_dir: Optional[str]):
        """Content-addressed BVH cache (SURVEY.md §5): skip the build when
        this exact geometry was built before (the reference rebuilds its CPU
        BVH on every startup)."""
        if cache_dir is None:
            return jax.block_until_ready(
                self._build_jit(self.mesh.vertices, self.mesh.indices))
        from .checkpoint import load_bvh, save_bvh, scene_key
        key = scene_key(np.asarray(host_mesh.vertices),
                        np.asarray(host_mesh.indices),
                        self.config.leaf_size)
        cached = load_bvh(cache_dir, key)
        if cached is not None:
            return jax.device_put(cached)
        bvh = jax.block_until_ready(
            self._build_jit(self.mesh.vertices, self.mesh.indices))
        save_bvh(cache_dir, key, jax.device_get(bvh))
        return bvh

    @staticmethod
    def _check_vmem_budget(config: RenderConfig, mesh: Mesh) -> RenderConfig:
        """The Pallas kernels keep the BVH VMEM-resident (~16 MB/core): one
        512-byte row per leaf plus ~half that for wide nodes. Scenes past the
        budget fall back to the pure-JAX traversal with a warning instead of
        failing deep inside the Mosaic compiler."""
        if not config.use_pallas:
            return config
        import math
        leaves = math.ceil(mesh.num_triangles / config.leaf_size)
        # One 512 B row per leaf + wide nodes (~0.36 rows/leaf measured on
        # the fixed depth-3 collapse) + ray blocks/scratch slack.
        est = leaves * 512 * 1.36 + 1.0e6
        if est > 15.8e6:
            import sys
            print(f"tpurt: scene needs ~{est/1e6:.1f} MB VMEM for the Pallas "
                  f"kernels (> ~14.5 MB budget at leaf_size="
                  f"{config.leaf_size}); falling back to the pure-JAX "
                  "traversal. Raise leaf_size (<= 14) or split the scene.",
                  file=sys.stderr)
            return dataclasses.replace(config, use_pallas=False,
                                       leaf_size=min(config.leaf_size, 8))
        return config

    def _make_accel(self):
        """Kernel-facing accel structure: 8-wide BVH for the Pallas path
        (the host sync for the wide-node count happens here, once per
        (re)build), else the LBVH itself."""
        from .passes.shading import make_shade_table
        self.shade_table = jax.jit(make_shade_table)(self.bvh, self.mesh)
        if self.config.use_pallas and self.config.bvh_width == 8:
            from .bvh.wide import count_wide, make_wide_plan, round_up_bucket
            nw_pad = round_up_bucket(max(count_wide(self.bvh), 1))
            self._wide_plan = jax.jit(
                make_wide_plan, static_argnames=("nw_pad",))(
                    self.bvh, nw_pad=nw_pad)
            from .bvh.wide import widen_from_plan
            return jax.block_until_ready(
                jax.jit(widen_from_plan)(self._wide_plan, self.bvh))
        return self.bvh

    def _refit_accel(self):
        """Refit fast path: topology (and therefore the wide plan) is
        frozen, so only boxes are re-gathered — no count host-sync. The
        shading table holds geometry (v0/e1/e2, normals) and must follow."""
        from .passes.shading import make_shade_table
        self.shade_table = jax.jit(make_shade_table)(self.bvh, self.mesh)
        if self.config.use_pallas and self.config.bvh_width == 8:
            from .bvh.wide import widen_from_plan
            return jax.jit(widen_from_plan)(self._wide_plan, self.bvh)
        return self.bvh

    # -- scene updates ------------------------------------------------------

    def set_camera(self, camera: Camera) -> None:
        self.camera = camera

    def set_lights(self, lights: Union[Light, Sequence[Light]]) -> None:
        if isinstance(lights, Light):
            lights = [lights]
        self.lights = list(lights)
        self.stats.num_lights = len(self.lights)

    def set_vertices(self, vertices) -> None:
        """Animate: new vertex positions, same topology (config 4). Vertex
        normals are recomputed on device so shading follows the motion."""
        from .passes.shading import smooth_normals_device
        v = jax.device_put(jnp.asarray(vertices))
        normals = jax.jit(smooth_normals_device)(v, self.mesh.indices)
        self.mesh = dataclasses.replace(self.mesh, vertices=v,
                                        normals=normals)

    # -- frame loop ---------------------------------------------------------

    def _update_bvh(self, timer: Timer) -> None:
        if self.mode == "rebuild":
            with timer.section("build", None):
                self.bvh = jax.block_until_ready(
                    self._build_jit(self.mesh.vertices, self.mesh.indices))
                self.accel = self._make_accel()
            self.stats.build_ms = timer.ms["build"]
        elif self.mode == "refit":
            with timer.section("refit", None):
                self.bvh = jax.block_until_ready(
                    self._refit_jit(self.bvh, self.mesh.vertices,
                                    self.mesh.indices))
                self.accel = self._refit_accel()
            self.stats.refit_ms = timer.ms["refit"]
            cost = float(sah_cost(self.bvh))
            if cost > self._base_cost * self.rebuild_threshold:
                # Refit quality degraded past the policy threshold: rebuild.
                with timer.section("build", None):
                    self.bvh = jax.block_until_ready(
                        self._build_jit(self.mesh.vertices,
                                        self.mesh.indices))
                    self.accel = self._make_accel()
                self.stats.build_ms = timer.ms["build"]
                self._base_cost = float(sah_cost(self.bvh))

    def render_frame(self, profile: bool = False) -> Dict[str, np.ndarray]:
        """Render one frame; returns the output dict (device arrays).

        profile=True re-runs the passes split at pass boundaries to collect
        per-pass timings (the HUD path); the returned image always comes from
        the fused pipeline.
        """
        cfg = self.config
        timer = Timer()
        self._update_bvh(timer)
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                 self.frame_index)
        with timer.section("frame", None):
            out = render_frame_fn(self.accel, self.mesh, self.camera,
                                  tuple(self.lights), key, cfg,
                                  shade_table=self.shade_table
                                  if cfg.use_pallas else None)
            jax.block_until_ready(out["image"])
        self.stats.frame_ms = timer.ms["frame"]

        if profile:
            self._profile_passes(key, timer)

        if cfg.accumulate:
            if self.accum is None:
                self.accum = out["image"]
            else:
                self.accum = accumulate(self.accum,
                                        jnp.int32(self.frame_index),
                                        out["image"])
            out = dict(out)
            out["image"] = self.accum

        valid = int(np.asarray(jnp.sum(out["valid"])))
        self.stats.rays_primary = cfg.num_pixels
        self.stats.rays_shadow = valid * cfg.spp * len(self.lights)
        shadow_s = (self.stats.shadow_ms or self.stats.frame_ms) / 1e3
        self.stats.mrays_per_s = mrays_per_s(self.stats.rays_shadow, shadow_s)
        self.frame_index += 1
        return out

    def _profile_passes(self, key, timer: Timer) -> None:
        cfg = self.config
        trace_closest, trace_any = make_tracers(cfg)
        gb = jax.jit(lambda bvh, mesh, cam: gbuffer_pass(
            lambda o, d: trace_closest(bvh, o, d), mesh, cam, cfg.width,
            cfg.height))
        with timer.section("gbuffer"):
            gbuf = gb(self.accel, self.mesh, self.camera)
            jax.block_until_ready(gbuf["t"])
        sp = jax.jit(lambda bvh, gbuf, light, k: shadow_pass(
            lambda o, d, tm: trace_any(bvh, o, d, tm), gbuf, light, cfg.spp,
            k, cfg.shadow_bias))
        with timer.section("shadow"):
            masks = []
            for li, light in enumerate(self.lights):
                masks.append(sp(self.accel, gbuf, light,
                                jax.random.fold_in(key, li)))
            jax.block_until_ready(masks)
        cp = jax.jit(lambda gbuf, mask, light: composite_pass(
            gbuf, mask, light, cfg.ambient, cfg.background))
        with timer.section("composite"):
            img = cp(gbuf, masks[0], self.lights[0])
            jax.block_until_ready(img)
        self.stats.gbuffer_ms = timer.ms["gbuffer"]
        self.stats.shadow_ms = timer.ms["shadow"]
        self.stats.composite_ms = timer.ms["composite"]

    # -- checkpoint / resume (SURVEY.md §5) ----------------------------------

    def save_state(self, path: str) -> None:
        """Checkpoint the temporal-accumulation state (config 3): resuming
        continues the running mean exactly."""
        from .checkpoint import save_accumulation
        accum = self.accum if self.accum is not None else \
            jnp.zeros((self.config.height, self.config.width, 3), jnp.float32)
        save_accumulation(path, accum, self.frame_index, self.config.seed)

    def load_state(self, path: str) -> None:
        from .checkpoint import load_accumulation
        accum, frame_index, seed = load_accumulation(path)
        assert seed == self.config.seed, (
            f"checkpoint seed {seed} != config seed {self.config.seed}")
        assert accum.shape == (self.config.height, self.config.width, 3)
        self.accum = jax.device_put(jnp.asarray(accum))
        self.frame_index = frame_index

    # -- io -----------------------------------------------------------------

    def save_png(self, path: str, out: Optional[Dict] = None) -> None:
        from .io.image import write_png
        if out is None:
            out = self.render_frame()
        write_png(path, np.asarray(out["image"]))
