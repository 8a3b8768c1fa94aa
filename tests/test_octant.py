"""Octant-slot child ordering (bvh/wide.order_children_octant) + the
near-first XOR visit in the closest walks (kernels/traverse._octant_visit).
SURVEY.md §3.5: traversal order is a pure performance lever — results
must be identical on any ordering, so parity against the unordered accel
is the whole correctness story; the perf claim is measured on-device by
probes/probe_r4c.py."""

import jax.numpy as jnp
import numpy as np
import pytest

import tpurt.kernels.traverse as ktr
from tpurt.bvh.lbvh import build_lbvh
from tpurt.bvh.wide import build_wide, order_children_octant
from tpurt.kernels.traverse import trace_any_pallas, trace_closest_pallas
from tpurt.scenes import random_soup

# Slow tier (round-5 re-tier): octant ordering was measured-and-retired
# (probe r4d) - parity coverage follows the variant out of the fast tier.
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def xor_visit_on(monkeypatch):
    """Exercise the XOR visit (default-off module flag) in every test
    here — parity must hold with the reordering active."""
    monkeypatch.setattr(ktr, "W8_OCTANT", True)


def _rays(rng, n, extent=8.0):
    o = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module")
def accels():
    mesh = random_soup(500, seed=21)
    bvh = build_lbvh(jnp.asarray(mesh.vertices), jnp.asarray(mesh.indices),
                     leaf_size=8)
    wide = build_wide(bvh)
    return wide, order_children_octant(wide)


def test_octant_order_is_a_permutation(accels):
    wide, oct_ = accels
    a = np.asarray(wide.nodes).reshape(-1, 8, 16)
    b = np.asarray(oct_.nodes).reshape(-1, 8, 16)
    # Same multiset of child records per node (sort rows lexicographically).
    a_sorted = np.sort(a.view([("", a.dtype)] * 16).reshape(-1, 8), axis=1)
    b_sorted = np.sort(b.view([("", b.dtype)] * 16).reshape(-1, 8), axis=1)
    assert (a_sorted == b_sorted).all()


def test_octant_order_closest_parity(accels):
    wide, oct_ = accels
    o, d = _rays(np.random.default_rng(4), 384)
    t0, i0 = trace_closest_pallas(wide, o, d, interpret=True)
    t1, i1 = trace_closest_pallas(oct_, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_octant_order_anyhit_parity(accels):
    wide, oct_ = accels
    o, d = _rays(np.random.default_rng(5), 384)
    tm = jnp.full((384,), 30.0, jnp.float32)
    h0 = trace_any_pallas(wide, o, d, tm, interpret=True)
    h1 = trace_any_pallas(oct_, o, d, tm, interpret=True)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
