"""MXU-dense tracer correctness vs the brute-force oracle, and attribute
fetch correctness vs direct gathers — extending the multi-engine oracle
(SURVEY.md §4) to the third backend."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.bruteforce import trace_bruteforce
from rayaccel_tpu.ops.trace_mxu import trace_mxu
from rayaccel_tpu.scene.clusters import (ATTR_GEOM_COL, compile_clusters,
                                          unpack_attrs_np)
from rayaccel_tpu.scene.loader import make_test_scene
from rayaccel_tpu.types import make_rays, INVALID_TRIANGLE

from tests.test_trace import assert_hits_match


@pytest.fixture(scope="module")
def scenes():
    sd = make_test_scene()
    from rayaccel_tpu.scene.compile import compile_scene
    return sd, compile_scene(sd), compile_clusters(sd, cluster_size=16)


def test_mxu_camera_rays(scenes):
    sd, ts, cs = scenes
    cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov, 64, 64)
    yy, xx = np.mgrid[0:64, 0:64]
    rays = generate_pixel_rays(cam.as_arrays(),
                               jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()))
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    h_mxu = trace_mxu(cs, rays, tile=1024).hits
    assert (np.asarray(h_mxu.tri) >= 0).mean() > 0.3
    assert_hits_match(h_ref, h_mxu, rays)


def test_mxu_random_rays(scenes, rng):
    sd, ts, cs = scenes
    n = 4096
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    h_mxu = trace_mxu(cs, rays, tile=512).hits
    assert_hits_match(h_ref, h_mxu, rays)


def test_mxu_attrs_match_gathers(scenes, rng):
    """One-hot attribute rows must equal directly gathered attributes."""
    sd, ts, cs = scenes
    n = 2048
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    res = trace_mxu(cs, rays, tile=1024)
    tri = np.asarray(res.hits.tri)
    attrs = np.asarray(res.attrs)
    hit = tri >= 0
    assert hit.sum() > 100
    idx = sd.indices[tri[hit]]
    up = unpack_attrs_np(attrs[hit])
    # Shading attrs are stored bf16 (2^-9 round-to-nearest rel error).
    np.testing.assert_allclose(up["n0"], sd.normals[idx[:, 0]], atol=2.5e-3)
    np.testing.assert_allclose(up["n1"], sd.normals[idx[:, 1]], atol=2.5e-3)
    np.testing.assert_allclose(up["n2"], sd.normals[idx[:, 2]], atol=2.5e-3)
    # ng is derived from the exact stored edges.
    e1 = attrs[hit, ATTR_GEOM_COL + 3:ATTR_GEOM_COL + 6]
    e2 = attrs[hit, ATTR_GEOM_COL + 6:ATTR_GEOM_COL + 9]
    ng = np.cross(e1, e2)
    ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    np.testing.assert_allclose(ng, sd.triangle_normals[tri[hit]], atol=1e-5)
    np.testing.assert_allclose(up["mat"],
                               sd.triangle_materials[tri[hit]].astype(np.float32),
                               atol=0)


def test_mxu_active_mask(scenes):
    sd, ts, cs = scenes
    n = 512
    o = jnp.broadcast_to(jnp.asarray([0.0, 5.0, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    rays = make_rays(o, d, tmin=0.0)
    active = jnp.arange(n) % 2 == 0
    h = trace_mxu(cs, rays, active=active, tile=512).hits
    tri = np.asarray(h.tri)
    assert np.all(tri[0::2] >= 0)
    assert np.all(tri[1::2] == INVALID_TRIANGLE)


def test_mxu_tmin_tmax(scenes, rng):
    sd, ts, cs = scenes
    n = 1024
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 5, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=1.0, tmax=4.0)
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    h_mxu = trace_mxu(cs, rays, tile=512).hits
    t = np.asarray(h_mxu.t)
    hit = np.asarray(h_mxu.tri) >= 0
    assert np.all(t[hit] > 1.0 - 1e-6)
    assert np.all(t[hit] <= 4.0 + 1e-5)
    assert_hits_match(h_ref, h_mxu, rays)


def test_occlusion_matches_closest_hit(scenes, rng):
    """Any-hit occlusion query agrees with 'closest hit exists'
    (an RTC_OCCLUDED-style query; BASELINE.md config 1 shadow rays)."""
    from rayaccel_tpu.ops.trace_mxu import trace_occlusion_mxu
    sd, ts, cs = scenes
    n = 2048
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=20.0)
    occ = np.asarray(trace_occlusion_mxu(cs, rays, tile=512))
    hit = np.asarray(trace_mxu(cs, rays, tile=512).hits.tri) >= 0
    np.testing.assert_array_equal(occ, hit)


def test_occlusion_respects_active_and_tmax(scenes):
    from rayaccel_tpu.ops.trace_mxu import trace_occlusion_mxu
    sd, ts, cs = scenes
    n = 512
    o = jnp.broadcast_to(jnp.asarray([0.0, 5.0, 0.0]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    rays = make_rays(o, d, tmin=0.0, tmax=100.0)
    active = jnp.arange(n) % 2 == 0
    occ = np.asarray(trace_occlusion_mxu(cs, rays, active=active, tile=512))
    assert occ[0::2].all() and not occ[1::2].any()
    # tmax shorter than the ground distance: nothing occludes.
    rays2 = make_rays(o, d, tmin=0.0, tmax=1.0)
    occ2 = np.asarray(trace_occlusion_mxu(cs, rays2, tile=512))
    assert not occ2.any()


def _slab_stack_scene(n_slabs=160):
    """n_slabs stacked quads under a ray column + a far-off ground quad:
    rays through the stack overlap every slab cluster (forcing pallas
    work-queue overflow at cluster_size=2), rays over the ground overlap
    almost nothing (their tile must still be traced)."""
    from rayaccel_tpu.scene.data import (SceneData, compute_face_normals,
                                         compute_vertex_normals)
    verts = []
    idx = []
    for i in range(n_slabs):
        y = 10.0 - 0.05 * i
        b = len(verts)
        verts += [(-1, y, -1), (1, y, -1), (1, y, 1), (-1, y, 1)]
        idx += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
    b = len(verts)
    verts += [(90, 0, -10), (110, 0, -10), (110, 0, 10), (90, 0, 10)]
    idx += [(b, b + 1, b + 2), (b, b + 2, b + 3)]
    verts = np.asarray(verts, np.float32)
    idx = np.asarray(idx, np.uint32)
    return SceneData(
        vertices=verts, indices=idx,
        triangle_materials=np.zeros(len(idx), np.uint16),
        triangle_normals=compute_face_normals(verts, idx),
        normals=compute_vertex_normals(verts, idx),
        texcoords=np.zeros((len(verts), 2), np.float32),
        materials=np.asarray([[0.8, 0.8, 0.8, 1.5]], np.float32),
    ).validate()


def test_pallas_queue_overflow_keeps_all_tiles():
    """When a tile overlaps more clusters than the largest queue bucket,
    only that tile's FARTHEST clusters may be dropped (counted in
    overflow); other tiles keep their queues and their output blocks are
    still written (regression: global truncation zeroed trailing tiles).
    Forces overflow via a small ``tile_cap`` override (the production
    default 256 was raised after the round-5 horizon-band incident)."""
    from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
    tile_cap = 64
    sd = _slab_stack_scene()
    cs = compile_clusters(sd, cluster_size=2)
    assert cs.n_clusters > tile_cap

    tile = 256
    n = 2 * tile
    o = np.zeros((n, 3), np.float32)
    d = np.zeros((n, 3), np.float32)
    o[:, 0] = np.linspace(-0.9, -0.1, n)   # keep off the quads' diagonals
    o[:, 1] = 20.0
    o[:, 2] = 0.3
    o[tile:, 0] += 100.0         # tile 1 sits over the ground quad
    d[:, 1] = -1.0
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)

    res, overflow = trace_mxu_pallas(cs, rays, tile=tile, tile_cap=tile_cap)
    assert int(overflow) > 0, "test must actually force queue overflow"

    tri = np.asarray(res.hits.tri)
    t = np.asarray(res.hits.t)
    # Tile 0: nearest slab (top of the stack) survives the clamp because
    # the per-tile queue keeps the NEAREST clusters front-to-back.
    assert np.all(tri[:tile] >= 0)
    np.testing.assert_allclose(t[:tile], 10.0, atol=1e-4)
    # Tile 1 (no overflow of its own) must still be fully traced.
    ground_tris = {len(sd.indices) - 2, len(sd.indices) - 1}
    assert set(tri[tile:].tolist()) <= ground_tris
    np.testing.assert_allclose(t[tile:], 20.0, atol=1e-4)


def test_pallas_default_cap_resolves_deep_unions():
    """The production tile_cap must cover tiles overlapping FAR more
    clusters than the old 64 clamp: grazing horizon tiles truncated
    their far clusters into sky — a contiguous wrong band covering ~6%
    of battlefield pixels (round-5 whole-image oracle incident). The
    slab stack forces a ~160-cluster union; with the default cap the
    dense engine must drop nothing and agree with the exact mxu engine
    everywhere — including rays whose winner is the 161st cluster."""
    from rayaccel_tpu.ops.trace_mxu import trace_mxu
    from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
    sd = _slab_stack_scene()
    cs = compile_clusters(sd, cluster_size=2)
    assert cs.n_clusters > 64          # old clamp would truncate

    tile = 256
    n = 2 * tile
    o = np.zeros((n, 3), np.float32)
    d = np.zeros((n, 3), np.float32)
    o[:, 0] = np.linspace(-0.9, -0.1, n)
    o[:, 1] = 20.0
    o[:, 2] = 0.3
    d[:, 1] = -1.0
    # Second tile: rays that START BELOW the whole stack and hit the
    # far ground — the winner sits behind every slab cluster, the exact
    # class the 64 clamp rendered as miss.
    o[tile:, 0] += 100.0
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)

    res, overflow = trace_mxu_pallas(cs, rays, tile=tile)
    ref = trace_mxu(cs, rays, tile=tile)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(res.hits.tri),
                                  np.asarray(ref.hits.tri))
    np.testing.assert_allclose(np.asarray(res.hits.t),
                               np.asarray(ref.hits.t), rtol=1e-5)


def test_occlusion_xla_and_pallas_match_mxu(scenes, rng):
    """Any-hit queries must agree across all three engines (the same
    cross-engine oracle as closest-hit; reference early-exit semantics
    Kernels.h:190-210)."""
    from rayaccel_tpu.ops.trace import trace_occlusion_bvh
    from rayaccel_tpu.ops.trace_mxu import trace_occlusion_mxu
    from rayaccel_tpu.ops.trace_pallas import trace_occlusion_pallas
    from rayaccel_tpu.ops.trace_sparse import trace_occlusion_sparse
    sd, ts, cs = scenes
    n = 2048
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=20.0)
    active = jnp.arange(n) % 4 != 3
    occ_mxu = np.asarray(trace_occlusion_mxu(cs, rays, active=active, tile=512))
    occ_xla = np.asarray(trace_occlusion_bvh(ts, rays, active=active))
    occ_pls = np.asarray(trace_occlusion_pallas(cs, rays, active=active,
                                                tile=512))
    occ_sps_m, under = trace_occlusion_sparse(cs, rays, active=active,
                                              sp_tile=512)
    occ_sps = np.asarray(occ_sps_m)
    np.testing.assert_array_equal(occ_xla, occ_mxu)
    np.testing.assert_array_equal(occ_pls, occ_mxu)
    np.testing.assert_array_equal(occ_sps, occ_mxu)
    assert int(under) == 0
    assert not occ_mxu[3::4].any()


def test_occlusion_sparse_multipass_tiny_k(scenes, rng):
    """The sparse any-hit must stay exact when k_pairs is below the
    overlap tail: unoccluded rays with a valid spill restart until the
    window is exhausted (the any-hit analog of the closest-hit spill
    multipass)."""
    from rayaccel_tpu.ops.trace import trace_occlusion_bvh
    from rayaccel_tpu.ops.trace_sparse import trace_occlusion_sparse
    sd, ts, cs = scenes
    n = 1024
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=20.0)
    occ_ref = np.asarray(trace_occlusion_bvh(ts, rays))
    occ_m, under = trace_occlusion_sparse(cs, rays, k_pairs=1,
                                          sp_tile=512, max_passes=24)
    np.testing.assert_array_equal(np.asarray(occ_m), occ_ref)
    assert int(under) == 0


def test_occlusion_sparse_reports_under_resolved(scenes, rng):
    """Shadow rays still unresolved at the restart-pass cap must be
    REPORTED (they are conservatively unoccluded — the light-leak
    direction), not silently dropped (VERDICT r3 weak #4): with k=1 and
    max_passes=1 on overlap-heavy rays the counter must fire, and the
    leak must be one-sided (occluded subset of the exact reference)."""
    from rayaccel_tpu.ops.trace import trace_occlusion_bvh
    from rayaccel_tpu.ops.trace_sparse import trace_occlusion_sparse
    sd, ts, cs = scenes
    n = 1024
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=20.0)
    occ_ref = np.asarray(trace_occlusion_bvh(ts, rays))
    occ_m, under = trace_occlusion_sparse(cs, rays, k_pairs=1,
                                          sp_tile=512, max_passes=1)
    occ = np.asarray(occ_m)
    missed = occ_ref & ~occ          # leaked shadows (reported unoccluded)
    assert not (~occ_ref & occ).any(), "under-resolution must never " \
                                       "create phantom occlusion"
    # Every leak is accounted for: the counter bounds the missed set.
    assert int(under) >= missed.sum()
    if missed.any():
        assert int(under) > 0
