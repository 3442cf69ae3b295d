"""Native C++ scene compiler vs the NumPy golden implementation."""

import numpy as np
import pytest

from rayaccel_tpu.scene.bvh import build_bvh, triangle_bounds, validate_bvh
from rayaccel_tpu.scene.native import native_available, build_bvh_native
from rayaccel_tpu.scene.pairs import build_pairs, unpack_rotation
from rayaccel_tpu.scene.loader import make_test_scene, make_battlefield_like

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native compiler unavailable")


def test_native_bvh_matches_python():
    s = make_test_scene()
    idx = s.indices.astype(np.int64)
    b_py = build_bvh(s.vertices, idx, use_native=False)
    b_cc = build_bvh(s.vertices, idx, use_native=True)
    tmin, tmax = triangle_bounds(s.vertices, idx)
    validate_bvh(b_cc, tmin, tmax)
    # Same builder family with identical tie-breaking: trees should agree.
    assert b_cc.node_count == b_py.node_count
    np.testing.assert_array_equal(b_cc.kind, b_py.kind)
    np.testing.assert_array_equal(b_cc.prim_order, b_py.prim_order)
    np.testing.assert_allclose(b_cc.bbmin, b_py.bbmin, atol=1e-6)


def test_native_bvh_large_scene_valid():
    s = make_battlefield_like(n_objects=100, grid=61)
    idx = s.indices.astype(np.int64)
    bvh = build_bvh(s.vertices, idx, use_native=True)
    tmin, tmax = triangle_bounds(s.vertices, idx)
    validate_bvh(bvh, tmin, tmax)


def test_native_pairs_match_python():
    s = make_test_scene()
    idx = s.indices.astype(np.int64)
    bvh = build_bvh(s.vertices, idx, use_native=True)
    p_py = build_pairs(bvh, s.vertices, idx, use_native=False)
    p_cc = build_pairs(bvh, s.vertices, idx, use_native=True)
    assert p_cc.pairs.shape == p_py.pairs.shape
    np.testing.assert_allclose(p_cc.pairs, p_py.pairs, atol=1e-6)
    np.testing.assert_array_equal(p_cc.pair_tri, p_py.pair_tri)
    np.testing.assert_array_equal(p_cc.leaf_first, p_py.leaf_first)
    tri, _ = unpack_rotation(p_cc.pair_tri)
    assert set(tri.tolist()) == set(range(len(idx)))
