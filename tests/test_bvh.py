"""BVH builder structural tests — the invariants implicit in the
reference builder (Bvh2.cpp:257-535), per SURVEY.md §4."""

import numpy as np
import pytest

from rayaccel_tpu.scene.bvh import (MAX_LEAF_TRIS, build_bvh,
                                    triangle_bounds, validate_bvh)
from rayaccel_tpu.scene.loader import make_test_scene


def random_soup(n, seed=0):
    r = np.random.default_rng(seed)
    base = r.uniform(-10, 10, (n, 1, 3))
    verts = (base + r.normal(0, 0.5, (n, 3, 3))).reshape(-1, 3).astype(np.float32)
    idx = np.arange(3 * n, dtype=np.int64).reshape(n, 3)
    return verts, idx


@pytest.mark.parametrize("n", [1, 2, 7, 100, 2000])
def test_bvh_valid_random(n):
    verts, idx = random_soup(n, seed=n)
    bvh = build_bvh(verts, idx)
    tmin, tmax = triangle_bounds(verts, idx)
    validate_bvh(bvh, tmin, tmax)


def test_bvh_valid_structured():
    s = make_test_scene()
    bvh = build_bvh(s.vertices, s.indices.astype(np.int64))
    tmin, tmax = triangle_bounds(s.vertices, s.indices.astype(np.int64))
    validate_bvh(bvh, tmin, tmax)


def test_forced_split_respects_max_leaf():
    # Many coincident triangles force SAH toward one big leaf; the builder
    # must still respect the 127-triangle cap (Bvh2.cpp:468-485).
    n = 400
    verts, idx = random_soup(n, seed=3)
    verts = verts * np.float32(1e-6)  # collapse everything to a tiny cluster
    bvh = build_bvh(verts, idx)
    leaf_sizes = (bvh.last - bvh.first)[bvh.kind == 0]
    assert leaf_sizes.max() <= MAX_LEAF_TRIS
    tmin, tmax = triangle_bounds(verts, idx)
    validate_bvh(bvh, tmin, tmax)


def test_sah_prefers_spatial_split():
    # Two well-separated clusters should be split at the top.
    verts_a, idx_a = random_soup(50, seed=1)
    verts_b, idx_b = random_soup(50, seed=2)
    verts = np.concatenate([verts_a, verts_b + np.float32([1000, 0, 0])])
    idx = np.concatenate([idx_a, idx_b + len(verts_a)])
    bvh = build_bvh(verts, idx)
    assert bvh.kind[0] == 1  # root is interior
    l, r = bvh.first[0], bvh.last[0]
    # The two subtrees should not overlap on x.
    assert bvh.bbmax[l][0] < bvh.bbmin[r][0] or bvh.bbmax[r][0] < bvh.bbmin[l][0]
