"""TrianglePair compiler tests: pairing round-trip (SURVEY.md §4:
pairing -> unpair remap = identity, Scene.cpp:122-181 + Kernels.h:224-238)."""

import numpy as np
import jax.numpy as jnp

from rayaccel_tpu.scene.bvh import build_bvh
from rayaccel_tpu.scene.pairs import build_pairs, unpack_rotation
from rayaccel_tpu.scene.loader import make_test_scene
from rayaccel_tpu.ops.intersect import (moller_trumbore, rotate_barycentrics,
                                        triangle_pair_intersect)


def _paired(scene):
    idx = scene.indices.astype(np.int64)
    bvh = build_bvh(scene.vertices, idx)
    return bvh, build_pairs(bvh, scene.vertices, idx), idx


def test_every_triangle_covered():
    scene = make_test_scene()
    _, paired, idx = _paired(scene)
    tri, _ = unpack_rotation(paired.pair_tri)
    # Each triangle appears at least once; degenerate self-pairs duplicate.
    assert set(tri.tolist()) == set(range(len(idx)))


def test_mesh_triangles_actually_pair():
    # A grid mesh has shared edges everywhere; most pairs should be real.
    scene = make_test_scene()
    _, paired, idx = _paired(scene)
    tri, _ = unpack_rotation(paired.pair_tri)
    t0, t1 = tri[0::2], tri[1::2]
    real_pairs = (t0 != t1).sum()
    assert real_pairs > 0.5 * len(t0)


def test_pair_intersect_matches_moller_trumbore():
    """The pair intersector + barycentric un-rotation must reproduce the
    per-original-triangle Moller-Trumbore result (u toward v1, v toward v2)."""
    scene = make_test_scene()
    _, paired, idx = _paired(scene)
    verts = scene.vertices
    rng = np.random.default_rng(5)

    pairs = jnp.asarray(np.pad(paired.pairs, ((0, 0), (0, 4))))
    tri_ids, codes = unpack_rotation(paired.pair_tri)

    n_rays = 400
    # Aim rays at random points inside random triangles.
    pick = rng.integers(0, len(idx), n_rays)
    b = rng.dirichlet((1, 1, 1), n_rays).astype(np.float32)
    target = (verts[idx[pick, 0]] * b[:, :1]
              + verts[idx[pick, 1]] * b[:, 1:2]
              + verts[idx[pick, 2]] * b[:, 2:3])
    origin = target + rng.normal(0, 3, (n_rays, 3)).astype(np.float32)
    d = target - origin
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)

    o = jnp.asarray(origin)
    dd = jnp.asarray(d.astype(np.float32))
    tmin = jnp.zeros(n_rays)
    tmax = jnp.full(n_rays, 1e6)

    P = pairs.shape[0]
    agree = 0
    checked = 0
    for p in range(P):
        row = jnp.broadcast_to(pairs[p], (n_rays, 16))
        ph = triangle_pair_intersect(row, o, dd, tmin, tmax)
        for w in (0, 1):
            slot = 2 * p + w
            tri = int(tri_ids[slot])
            code = int(codes[slot])
            v0, v1, v2 = verts[idx[tri, 0]], verts[idx[tri, 1]], verts[idx[tri, 2]]
            valid_mt, t_mt, u_mt, v_mt = moller_trumbore(
                jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2),
                o, dd, tmin, tmax)
            sel = np.asarray(ph.valid & (ph.which == w))
            if w == 1 and tri == int(tri_ids[2 * p]):
                continue  # degenerate second slot never hits
            vm = np.asarray(valid_mt)
            both = sel & vm
            if not both.any():
                continue
            u_r, v_r = rotate_barycentrics(jnp.int32(code), ph.u, ph.v)
            np.testing.assert_allclose(np.asarray(ph.t)[both],
                                       np.asarray(t_mt)[both], rtol=2e-4, atol=2e-4)
            np.testing.assert_allclose(np.asarray(u_r)[both],
                                       np.asarray(u_mt)[both], rtol=3e-3, atol=3e-3)
            np.testing.assert_allclose(np.asarray(v_r)[both],
                                       np.asarray(v_mt)[both], rtol=3e-3, atol=3e-3)
            agree += int(both.sum())
            checked += 1
    assert agree > 100, f"too few verified intersections ({agree})"
