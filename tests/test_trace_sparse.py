"""Pair-centric sparse tracer vs the brute-force oracle — the fourth
engine joins the cross-engine oracle (SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rayaccel_tpu.ops.bruteforce import trace_bruteforce
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.scene.clusters import (ATTR_GEOM_COL, compile_clusters,
                                          unpack_attrs_np)
from rayaccel_tpu.scene.loader import make_test_scene
from rayaccel_tpu.types import make_rays, INVALID_TRIANGLE

from tests.test_trace import assert_hits_match_near_ties


@pytest.fixture(scope="module")
def scenes():
    sd = make_test_scene()
    from rayaccel_tpu.scene.compile import compile_scene
    return sd, compile_scene(sd), compile_clusters(sd, cluster_size=16)


def test_sparse_camera_rays(scenes):
    sd, ts, cs = scenes
    cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                         64, 64)
    yy, xx = np.mgrid[0:64, 0:64]
    rays = generate_pixel_rays(cam.as_arrays(), jnp.asarray(xx.ravel()),
                               jnp.asarray(yy.ravel()))
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    res, overflow = trace_sparse(cs, rays, sp_tile=512)
    assert int(overflow) == 0
    assert (np.asarray(res.hits.tri) >= 0).mean() > 0.3
    assert_hits_match_near_ties(h_ref, res.hits, rays)


def test_sparse_random_rays(scenes, rng):
    sd, ts, cs = scenes
    n = 4096
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    res, overflow = trace_sparse(cs, rays, sp_tile=512)
    assert int(overflow) == 0
    assert_hits_match_near_ties(h_ref, res.hits, rays)


def test_sparse_attrs_and_active_mask(scenes):
    sd, ts, cs = scenes
    n = 1024
    o = jnp.broadcast_to(jnp.asarray([0.3, 5.0, 0.2]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    rays = make_rays(o, d, tmin=0.0)
    active = jnp.arange(n) % 2 == 0
    res, _ = trace_sparse(cs, rays, active=active, sp_tile=512)
    tri = np.asarray(res.hits.tri)
    assert np.all(tri[0::2] >= 0)
    assert np.all(tri[1::2] == INVALID_TRIANGLE)
    # Attribute rows must match the hit triangle (one-hot-free gather
    # path): ng derived from the row's exact edges.
    attrs = np.asarray(res.attrs)
    hit = tri >= 0
    e1 = attrs[hit, ATTR_GEOM_COL + 3:ATTR_GEOM_COL + 6]
    e2 = attrs[hit, ATTR_GEOM_COL + 6:ATTR_GEOM_COL + 9]
    ng = np.cross(e1, e2)
    ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    np.testing.assert_allclose(ng, sd.triangle_normals[tri[hit]], atol=1e-5)


def test_sparse_tmin_tmax(scenes, rng):
    sd, ts, cs = scenes
    n = 1024
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.5, 5, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=1.0, tmax=4.0)
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    res, _ = trace_sparse(cs, rays, sp_tile=512)
    t = np.asarray(res.hits.t)
    hit = np.asarray(res.hits.tri) >= 0
    assert np.all(t[hit] > 1.0 - 1e-6)
    assert np.all(t[hit] <= 4.0 + 1e-5)
    assert_hits_match_near_ties(h_ref, res.hits, rays)


def test_sparse_k_clamp_counts_overflow(scenes):
    """Rays overlapping more than k_pairs clusters keep the NEAREST ones;
    the rest are counted in overflow and the nearest hit is still found."""
    sd, ts, cs = scenes
    n = 512
    o = jnp.broadcast_to(jnp.asarray([0.3, 50.0, 0.2]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    rays = make_rays(o, d, tmin=0.0)
    full, ov_full = trace_sparse(cs, rays, k_pairs=8, sp_tile=512)
    tight, ov_tight = trace_sparse(cs, rays, k_pairs=1, sp_tile=512)
    assert int(ov_full) <= int(ov_tight)
    # The nearest cluster holds the top-of-box hit: winners agree.
    np.testing.assert_array_equal(np.asarray(full.hits.tri),
                                  np.asarray(tight.hits.tri))


def test_sparse_multipass_exact_with_tiny_k(scenes, rng):
    """k_pairs smaller than the overlap tail must still be EXACT: the
    spill-entry restart advances the window to farther clusters (the
    batched analog of ordered traversal resuming from a short stack,
    reference Kernels.h:169-211) instead of dropping them."""
    sd, ts, cs = scenes
    n = 2048
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    res, overflow = trace_sparse(cs, rays, sp_tile=512, k_pairs=2,
                                 max_passes=8)
    assert int(overflow) == 0
    assert_hits_match_near_ties(h_ref, res.hits, rays)


def test_sparse_rank_phased_exact(scenes, rng):
    """k_first=1 (rank-phased pass 1: nearest cluster only, unresolved
    rays go to the bucketed restarts) must produce exactly the hits of
    the batch engine — rank-phasing is a schedule, not an approximation."""
    sd, ts, cs = scenes
    n = 4096
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    full, ov_full = trace_sparse(cs, rays, sp_tile=512, max_passes=8)
    rp, ov_rp = trace_sparse(cs, rays, sp_tile=512, max_passes=8,
                             k_first=1)
    assert int(ov_rp) == 0 and int(ov_full) == 0
    np.testing.assert_array_equal(np.asarray(full.hits.tri),
                                  np.asarray(rp.hits.tri))
    np.testing.assert_allclose(np.asarray(full.hits.t),
                               np.asarray(rp.hits.t), rtol=1e-6)


def test_sparse_wide_restart_exact(scenes, rng):
    """k_restart=8 (wide restart passes: fewer dispatches for the same
    long-tail rays — each small pallas dispatch costs ~2 ms on hardware
    regardless of items, tools/probe_call_floor.py) must produce exactly
    the hits of the default schedule, with k_pairs=1 forcing most rays
    through the restart path. Occlusion variant checked alongside."""
    from rayaccel_tpu.ops.trace_sparse import trace_occlusion_sparse
    sd, ts, cs = scenes
    n = 4096
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    full, ov_full = trace_sparse(cs, rays, sp_tile=512, k_pairs=1,
                                 max_passes=8)
    wide, ov_wide = trace_sparse(cs, rays, sp_tile=512, k_pairs=1,
                                 max_passes=8, k_restart=8)
    assert int(ov_full) == 0 and int(ov_wide) == 0
    np.testing.assert_array_equal(np.asarray(full.hits.tri),
                                  np.asarray(wide.hits.tri))
    np.testing.assert_allclose(np.asarray(full.hits.t),
                               np.asarray(wide.hits.t), rtol=1e-6)
    occ_d, un_d = trace_occlusion_sparse(cs, rays, k_pairs=1,
                                         sp_tile=512, max_passes=8)
    occ_w, un_w = trace_occlusion_sparse(cs, rays, k_pairs=1,
                                         sp_tile=512, max_passes=8,
                                         k_restart=8)
    assert int(un_d) == 0 and int(un_w) == 0
    np.testing.assert_array_equal(np.asarray(occ_d), np.asarray(occ_w))


def test_sparse_pass_cap_reports_unresolved(scenes):
    """With the pass cap at 1, rays whose overlap spills past k_pairs
    cannot be proven complete and must be counted in overflow; raising
    the cap resolves them and overflow returns to 0."""
    sd, ts, cs = scenes
    n = 512
    o = jnp.broadcast_to(jnp.asarray([0.3, 50.0, 0.2]), (n, 3))
    d = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3))
    rays = make_rays(o, d, tmin=0.0)
    _, ov1 = trace_sparse(cs, rays, k_pairs=1, sp_tile=512, max_passes=1)
    _, ov8 = trace_sparse(cs, rays, k_pairs=1, sp_tile=512, max_passes=8)
    assert int(ov8) == 0
    assert int(ov1) >= int(ov8)


def test_sparse_restart_progress_on_tied_entries(rng):
    """Rays starting INSIDE several cluster AABBs see identical entry
    distances (all clamp to tmin): the spill entry equals the window
    start, so a restart that only advances tlo would re-select the same
    nearest-K set and spin to max_passes (counted as overflow, possibly
    keeping a non-nearest hit). The packed-word exclusion must advance
    past >= K fresh candidates per pass and resolve exactly.

    The scene is a fan of triangles all sharing the apex (0, 1, 0):
    every cluster's AABB contains the apex, so rays from it overlap all
    clusters at entry exactly 0."""
    import jax.numpy as jnp
    from rayaccel_tpu.ops.intersect import safe_inv_dir
    from rayaccel_tpu.scene.data import (SceneData, compute_face_normals,
                                         compute_vertex_normals)
    n_tri = 64
    verts, idx = [], []
    for i in range(n_tri):
        a = 2 * np.pi * i / n_tri
        b = a + 0.05
        bi = len(verts)
        verts += [(0.0, 1.0, 0.0),
                  (3 * np.cos(a), 1.3, 3 * np.sin(a)),
                  (3 * np.cos(b), 0.7, 3 * np.sin(b))]
        idx.append((bi, bi + 1, bi + 2))
    verts = np.asarray(verts, np.float32)
    idx = np.asarray(idx, np.uint32)
    sd = SceneData(
        vertices=verts, indices=idx,
        triangle_materials=np.zeros(len(idx), np.uint16),
        triangle_normals=compute_face_normals(verts, idx),
        normals=compute_vertex_normals(verts, idx),
        texcoords=np.zeros((len(verts), 2), np.float32),
        materials=np.asarray([[0.8, 0.8, 0.8, 1.5]], np.float32),
    ).validate()
    from rayaccel_tpu.scene.compile import compile_scene
    ts = compile_scene(sd)
    cs = compile_clusters(sd, cluster_size=8)

    n = 512
    o = np.tile(np.asarray([1e-3, 1.0, 2e-3], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    # Confirm the construction: every ray overlaps >= 3 clusters with
    # entry exactly 0 (tied at the window start).
    inv = safe_inv_dir(jnp.asarray(d))
    t0 = jnp.zeros((n, cs.n_clusters))
    t1 = jnp.full((n, cs.n_clusters), 1e6)
    for a in range(3):
        tn = (cs.cl_bbmin[:, a][None, :] - o[:, a][:, None]) * inv[:, a][:, None]
        tf = (cs.cl_bbmax[:, a][None, :] - o[:, a][:, None]) * inv[:, a][:, None]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    n_at_zero = np.asarray(jnp.sum(((t0 <= t1) & (t0 <= 0.0)).astype(np.int32),
                                   axis=1))
    # With k_pairs=1, two clusters tied at entry 0 already reproduce the
    # spin: the restart window cannot advance past a tied entry.
    assert n_at_zero.min() >= 2, "fan no longer produces tied entries"

    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)
    h_ref = trace_bruteforce(ts.tri_verts, rays)
    res, overflow = trace_sparse(cs, rays, sp_tile=512, k_pairs=1,
                                 max_passes=24)
    assert int(overflow) == 0
    assert_hits_match_near_ties(h_ref, res.hits, rays)


def test_select_kernel_matches_reference(scenes, rng):
    """The fused cull+select pallas kernel must pick the same nearest-K
    clusters as the XLA argmin-extract reference (up to packed-entry
    near-tie ordering)."""
    import jax
    from rayaccel_tpu.ops.intersect import safe_inv_dir
    from rayaccel_tpu.ops.trace_mxu import _INF
    from rayaccel_tpu.ops.trace_sparse import (_nearest_k,
                                               _select_nearest_pallas)
    sd, ts, cs = scenes
    n = 1024
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oc = tuple(jnp.asarray(o[:, a]) for a in range(3))
    inv = safe_inv_dir(jnp.asarray(d))
    invc = tuple(inv[:, a] for a in range(3))
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, 1e6)

    K = 6
    lv, lid, spill, cnt = _select_nearest_pallas(cs, oc, invc, tmin, tmax,
                                                 K, interpret=True)

    t0 = jnp.broadcast_to(tmin[:, None], (n, cs.n_clusters))
    t1 = jnp.broadcast_to(tmax[:, None], (n, cs.n_clusters))
    for a in range(3):
        tn = (cs.cl_bbmin[:, a][None, :] - oc[a][:, None]) * invc[a][:, None]
        tf = (cs.cl_bbmax[:, a][None, :] - oc[a][:, None]) * invc[a][:, None]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    entry = jnp.where(t0 <= t1, jnp.maximum(t0, 0.0), _INF)
    ref_e, ref_id = _nearest_k(entry, K)
    ref_valid = np.asarray(ref_e < _INF)

    np.testing.assert_array_equal(np.asarray(lv), ref_valid)
    # The SET of selected clusters per ray must match (packed low-bit
    # noise may permute near-equal entries between ranks).
    got = np.where(np.asarray(lv), np.asarray(lid), -1)
    want = np.where(ref_valid, np.asarray(ref_id), -1)
    for r in range(n):
        assert set(got[:, r]) == set(want[:, r]), r
    # cnt row = per-ray overlap; spill row = packed (K+1)-th entry, valid
    # exactly when the overlap exceeds K.
    ref_cnt = np.asarray(jnp.sum((entry < _INF).astype(jnp.int32), axis=1))
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)
    np.testing.assert_array_equal(np.asarray(spill) < 0x7F800000,
                                  ref_cnt > K)


def test_sparse_packed_sort_matches_fallback(scenes, rng, monkeypatch):
    """The packed single-operand lattice sort and the 2-operand fallback
    must produce identical hits: they differ only in within-cluster pair
    order (rank-major vs ray-major), which the packed min-merge and the
    per-ray scatter-min are both invariant to (absent truncation). The
    fallback never triggers at test scales (the key always fits 32
    bits), so force it via the module bit budget."""
    import rayaccel_tpu.ops.trace_sparse as sparse_mod

    sd, ts, cs = scenes
    n = 2048
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    o[:, 1] = rng.uniform(0.2, 6, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = make_rays(jnp.asarray(o), jnp.asarray(d), tmin=0.0, tmax=1e6)

    trace_sparse.clear_cache()
    res_p, ov_p = trace_sparse(cs, rays, sp_tile=512)
    monkeypatch.setattr(sparse_mod, "PACKED_SORT_MAX_BITS", 0)
    trace_sparse.clear_cache()
    res_f, ov_f = trace_sparse(cs, rays, sp_tile=512)
    trace_sparse.clear_cache()

    assert int(ov_p) == int(ov_f) == 0
    np.testing.assert_array_equal(np.asarray(res_p.hits.tri),
                                  np.asarray(res_f.hits.tri))
    np.testing.assert_array_equal(np.asarray(res_p.hits.t),
                                  np.asarray(res_f.hits.t))
