"""Stage-8 tests: multi-chip pixel-tile sharding on the fake 8-device CPU
mesh (SURVEY.md §4.5 — the distributed test without a cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpurt.app import render_frame_fn
from tpurt.bvh.lbvh import build_lbvh
from tpurt.parallel.tiling import (device_put_replicated, make_tile_mesh,
                                   render_frame_sharded)
from tpurt.scenes import default_camera_for, teapot_scene
from tpurt.types import Light, RenderConfig


@pytest.fixture(scope="module")
def scene():
    mesh = teapot_scene(1000)
    cam = default_camera_for(mesh)
    light = Light.directional((0.45, 0.8, 0.3))
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=4)
    return mesh, cam, light, bvh


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8, (
        "conftest must provide 8 fake CPU devices")


def test_sharded_matches_single_device(scene):
    mesh, cam, light, bvh = scene
    cfg = RenderConfig(width=64, height=48, use_pallas=False)
    key = jax.random.PRNGKey(0)
    want = np.asarray(render_frame_fn(bvh, mesh, cam, (light,), key,
                                      cfg)["image"])
    dev_mesh = make_tile_mesh()
    img = render_frame_sharded(bvh, mesh, cam, (light,), key, cfg,
                               mesh=dev_mesh)
    got = np.asarray(img)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_output_is_row_sharded(scene):
    mesh, cam, light, bvh = scene
    cfg = RenderConfig(width=64, height=64, use_pallas=False)
    dev_mesh = make_tile_mesh()
    mesh_r = device_put_replicated(mesh, dev_mesh)
    bvh_r = device_put_replicated(bvh, dev_mesh)
    img = render_frame_sharded(bvh_r, mesh_r, cam, (light,),
                               jax.random.PRNGKey(0), cfg, mesh=dev_mesh)
    # 64 rows over 8 devices -> each shard holds 8 rows.
    shard_shapes = {s.data.shape for s in img.addressable_shards}
    assert shard_shapes == {(8, 64, 3)}


def test_sharded_height_not_divisible(scene):
    mesh, cam, light, bvh = scene
    cfg = RenderConfig(width=32, height=30, use_pallas=False)  # 30 % 8 != 0
    img = render_frame_sharded(bvh, mesh, cam, (light,),
                               jax.random.PRNGKey(0), cfg,
                               mesh=make_tile_mesh())
    assert np.asarray(img).shape == (30, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sharded_pallas_matches_single_device(scene):
    """The PRODUCTION Pallas traversal kernel under shard_map (interpret
    mode on the fake CPU mesh) must agree with the unsharded Pallas render —
    the multi-chip path may not silently require the pure-JAX fallback."""
    mesh, cam, light, bvh = scene
    cfg = RenderConfig(width=64, height=48, use_pallas=True, leaf_size=4)
    key = jax.random.PRNGKey(0)
    want = np.asarray(render_frame_fn(bvh, mesh, cam, (light,), key,
                                      cfg)["image"])
    img = render_frame_sharded(bvh, mesh, cam, (light,), key, cfg,
                               mesh=make_tile_mesh())
    got = np.asarray(img)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_soft_shadows_decorrelated(scene):
    """Each shard folds its axis index into the RNG: the penumbra jitter
    must not repeat identically across shards."""
    mesh, cam, _, bvh = scene
    sun = Light.sun((0.45, 0.8, 0.3), angular_radius_deg=20.0)
    # 1 row of pixels per shard, looking at the same geometry: identical
    # shard RNG would produce identical penumbra rows.
    cfg = RenderConfig(width=64, height=8, spp=1, use_pallas=False)
    img = np.asarray(render_frame_sharded(bvh, mesh, cam, (sun,),
                                          jax.random.PRNGKey(3), cfg,
                                          mesh=make_tile_mesh()))
    assert np.isfinite(img).all()
    # Compare each shard's row against every other: some penumbra pixels
    # exist (cone angle 20 deg) and rows must not be bitwise-identical.
    rows = img.reshape(8, -1)
    distinct = {rows[i].tobytes() for i in range(8)}
    assert len(distinct) > 1, "shards drew identical shadow jitter"


def test_dryrun_multichip_entry():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    img = jax.jit(fn)(*args)
    assert img.shape == (256, 256, 3)
    assert np.isfinite(np.asarray(img)).all()
