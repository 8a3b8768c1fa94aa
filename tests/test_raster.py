"""Tile-rasterizer tests: parity with the ray-cast G-buffer (the two
independent visibility implementations cross-check each other, the same
oracle pattern as the reference's HW-vs-compute shadow paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.app import Renderer, render_frame_fn
from tpurt.bvh.lbvh import build_lbvh
from tpurt.bvh import traverse as jt
from tpurt.passes.gbuffer import gbuffer_pass, gbuffer_raster_pass
from tpurt.passes.shading import make_shade_table_orig
from tpurt.scenes import default_camera_for, teapot_scene
from tpurt.types import Camera, Light, RenderConfig

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only

W, H = 96, 64


@pytest.fixture(scope="module")
def scene():
    mesh = teapot_scene(1500)
    cam = default_camera_for(mesh)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=4)
    return mesh, cam, bvh


def _gbuffers(mesh, cam, bvh, width=W, height=H, deferred=False):
    ray = gbuffer_pass(lambda o, d: jt.traverse(bvh, o, d, any_hit=False),
                       mesh, cam, width, height)
    st = jax.jit(make_shade_table_orig)(mesh)
    ras = jax.jit(lambda st: gbuffer_raster_pass(mesh, cam, width, height,
                                                 st, deferred=deferred))(st)
    return ray, ras


@pytest.mark.parametrize("deferred", [False, True])
def test_raster_matches_raycast_gbuffer(scene, deferred):
    mesh, cam, bvh = scene
    ray, ras = _gbuffers(mesh, cam, bvh, deferred=deferred)
    assert not bool(np.asarray(ras["raster_overflow"]))
    rv = np.asarray(ray["valid"])
    sv = np.asarray(ras["valid"])
    # Coverage: identical up to a tiny silhouette-pixel budget.
    assert (rv != sv).mean() < 0.002
    both = rv & sv
    same_tri = (np.asarray(ray["tri_id"]) == np.asarray(ras["tri_id"]))[both]
    assert same_tri.mean() > 0.995
    dp = np.abs(np.asarray(ray["position"])
                - np.asarray(ras["position"])).max(axis=-1)[both]
    assert np.percentile(dp, 99) < 1e-3
    dn = np.abs(np.asarray(ray["normal"])
                - np.asarray(ras["normal"])).max(axis=-1)[both]
    assert np.percentile(dn, 99) < 1e-2
    dd = np.abs(np.asarray(ray["depth"]) - np.asarray(ras["depth"]))[both]
    assert np.percentile(dd, 99) < 0.05


@pytest.mark.parametrize("deferred", [False, True])
def test_raster_camera_inside_scene(scene, deferred):
    """Eye-plane-crossing triangles (big list / 2DH path): camera placed
    between geometry, looking out — must not crash, hallucinate
    behind-camera geometry, or drop foreground coverage."""
    mesh, _, bvh = scene
    v = np.asarray(mesh.vertices)
    center = v.mean(axis=0)
    cam = Camera.look_at(center + [0.01, 0.05, 0.01], center + [1.2, 0.2, 0.4],
                         fov_y_deg=70)
    ray, ras = _gbuffers(mesh, cam, bvh, deferred=deferred)
    rv = np.asarray(ray["valid"])
    sv = np.asarray(ras["valid"])
    assert (rv != sv).mean() < 0.01
    both = rv & sv
    dd = np.abs(np.asarray(ray["depth"]) - np.asarray(ras["depth"]))[both]
    assert np.percentile(dd, 99) < 0.05


def test_raster_full_frame_matches_ray_frame(scene):
    """Full fused frame with gbuffer="raster" vs gbuffer="ray": images agree
    except at silhouette pixels."""
    mesh, cam, bvh = scene
    light = Light.directional((0.45, 0.8, 0.3))
    key = jax.random.PRNGKey(0)
    st_orig = jax.jit(make_shade_table_orig)(mesh)
    cfg_ray = RenderConfig(width=W, height=H, use_pallas=False,
                           gbuffer="ray")
    cfg_ras = RenderConfig(width=W, height=H, use_pallas=False,
                           gbuffer="raster")
    a = np.asarray(render_frame_fn(bvh, mesh, cam, (light,), key,
                                   cfg_ray)["image"])
    b = np.asarray(render_frame_fn(bvh, mesh, cam, (light,), key, cfg_ras,
                                   shade_table_orig=st_orig)["image"])
    diff = np.abs(a - b).max(axis=-1)
    assert (diff > 2e-2).mean() < 0.01


def test_renderer_raster_mode(scene):
    mesh, cam, _ = scene
    light = Light.directional((0.45, 0.8, 0.3))
    cfg = RenderConfig(width=48, height=32, use_pallas=False,
                       gbuffer="raster")
    r = Renderer(mesh, cam, light, cfg)
    out = r.render_frame()
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    assert np.asarray(out["valid"]).sum() > 100


def test_raster_overflow_recovery(scene):
    """An undersized pair capacity must be detected and recovered by
    doubling, not silently hole-punched."""
    mesh, cam, _ = scene
    light = Light.directional((0.45, 0.8, 0.3))
    cfg = RenderConfig(width=48, height=32, use_pallas=False,
                       gbuffer="raster", raster_cap_pairs=256)
    r = Renderer(mesh, cam, light, cfg)
    out = r.render_frame()
    assert r.config.raster_cap_pairs > 256  # grew at least once
    assert not bool(np.asarray(out["raster_overflow"]))
    # And the recovered image matches an amply-sized first try.
    r2 = Renderer(mesh, cam, light, RenderConfig(
        width=48, height=32, use_pallas=False, gbuffer="raster"))
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(r2.render_frame()["image"]),
                               rtol=1e-5, atol=1e-6)
