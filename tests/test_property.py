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


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_cache():
    """The full-suite SIGSEGV (VERDICT r3) crashed 3/3 inside
    compilation_cache.put_executable_and_time (zstd serialization of a
    fresh executable) while THIS module's compile storm ran late in the
    suite. Property tests compile dozens of unique tiny programs that a
    cache can never amortize anyway — disable the persistent cache for
    the module so the crash site is never reached."""
    import jax
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


@st.composite
def scene_and_rays(draw):
    # nt is drawn from fixed buckets, not a continuous range: every
    # distinct triangle count is a distinct XLA program, and the compile
    # storm (not the checking) is what made this module take 4+ minutes
    # per test. Seeds (content) stay fully random.
    nt = draw(st.sampled_from([9, 16, 33, 64, 120]))
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


@settings(max_examples=8, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1),
       st.integers(min_value=1, max_value=3),
       st.integers(min_value=0, max_value=7))
def test_multi_shadow_kernel_matches_per_light(seed, n_lights, kind_bits):
    """Random soups x random all-hard light sets: the N-light fused kernel's
    occlusion bits must equal N independent single-light fused runs
    bit-for-bit, with the plain closest kernel's hit set (kernels/traverse
    trace_closest_multi_shadow_pallas vs trace_closest_shadow_pallas)."""
    from tpurt.kernels.traverse import (trace_closest_multi_shadow_pallas,
                                        trace_closest_shadow_pallas)
    mesh = random_soup(40, seed=seed % 1000)
    rng = np.random.default_rng(seed)
    o = rng.uniform(-9, 9, (64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=4)
    wide = build_wide(bvh, bucket=64)
    spec = []
    for li in range(n_lights):
        if (kind_bits >> li) & 1:
            spec.append((None, jnp.asarray(
                rng.uniform(-12, 12, 3).astype(np.float32))))
        else:
            ld = rng.normal(size=3).astype(np.float32)
            ld /= max(np.linalg.norm(ld), 1e-9)
            spec.append((jnp.asarray(ld), None))
    t_m, sidx_m, occm = trace_closest_multi_shadow_pallas(
        wide, jnp.asarray(o), jnp.asarray(d), spec, 1e-3, interpret=True)
    occm = np.asarray(occm)
    assert (occm >> n_lights == 0).all(), "bits beyond the light set"
    for li, (ld, lp) in enumerate(spec):
        t_s, sidx_s, occ_s = trace_closest_shadow_pallas(
            wide, jnp.asarray(o), jnp.asarray(d),
            ld if ld is not None else jnp.ones(3, jnp.float32),
            1e-3, light_pos=lp, interpret=True)
        if li == 0:
            np.testing.assert_array_equal(np.asarray(sidx_m),
                                          np.asarray(sidx_s))
            np.testing.assert_array_equal(np.asarray(t_m), np.asarray(t_s))
        np.testing.assert_array_equal(
            (occm >> li) & 1, np.asarray(occ_s).astype(np.int32),
            err_msg=f"light {li} kind_bits={kind_bits}")
