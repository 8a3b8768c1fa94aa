"""Property-based tests (SURVEY.md §4.3): random meshes + random rays must
agree between brute force, the CPU oracle BVH, the JAX LBVH traversal, and
the Pallas kernels (interpret mode); refits after perturbation must stay
conservative."""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tpurt.bvh.lbvh import build_lbvh, refit_lbvh
from tpurt.bvh.reference import brute_force_closest
from tpurt.bvh.traverse import traverse
from tpurt.bvh.wide import build_wide
from tpurt.kernels.traverse import trace_closest_pallas
from tpurt.scenes import random_soup

pytestmark = pytest.mark.slow  # compile-heavy: full-suite tier only


@st.composite
def scene_and_rays(draw):
    nt = draw(st.integers(min_value=9, max_value=120))
    mesh_seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    ray_seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    leaf = draw(st.sampled_from([1, 2, 4, 7]))
    return nt, mesh_seed, ray_seed, leaf


@settings(max_examples=12, deadline=None)
@given(scene_and_rays())
def test_all_paths_agree_on_random_scenes(params):
    nt, mesh_seed, ray_seed, leaf = params
    mesh = random_soup(nt, seed=mesh_seed)
    rng = np.random.default_rng(ray_seed)
    o = rng.uniform(-9, 9, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)

    want_t, _ = brute_force_closest(mesh, o, d)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=leaf)
    jt, _ = traverse(bvh, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(jt), want_t, rtol=3e-4, atol=1e-6)

    wide = build_wide(bvh, bucket=64)
    kt, _ = trace_closest_pallas(wide, jnp.asarray(o), jnp.asarray(d),
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(kt), want_t, rtol=3e-4, atol=1e-6)


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.floats(min_value=0.01, max_value=2.0))
def test_refit_stays_conservative_under_perturbation(seed, amplitude):
    mesh = random_soup(60, seed=seed % 1000)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=4)
    rng = np.random.default_rng(seed)
    moved = (np.asarray(mesh.vertices)
             + rng.normal(0, amplitude,
                          mesh.vertices.shape).astype(np.float32))
    refit = refit_lbvh(bvh, jnp.asarray(moved), None)
    # Every child box must contain its subtree's triangles exactly: validate
    # via traversal-vs-brute-force agreement on the deformed geometry.
    import dataclasses
    mesh2 = dataclasses.replace(mesh, vertices=moved)
    o = rng.uniform(-9, 9, (32, 3)).astype(np.float32)
    d = rng.normal(size=(32, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    want_t, _ = brute_force_closest(mesh2, o, d)
    got_t, _ = traverse(refit, jnp.asarray(o), jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=3e-4,
                               atol=1e-6)
