"""Cluster scene compiler for the MXU-dense traversal backend.

TPU redesign rationale: per-lane gathers on TPU run at ~100M rows/s
(measured, independent of row width), so any traversal that fetches node
or triangle data per ray per step is capped at ~5-10 Mrays/s. The MXU,
in contrast, sustains tens of G ray-triangle tests/s. This module
restructures the scene so intersection becomes dense linear algebra:

- The SAH BVH2 is cut into *clusters*: maximal subtrees holding at most
  ``cluster_size`` triangles. Because the builder assigns each subtree a
  contiguous range of ``prim_order``, every cluster's triangles are
  contiguous after permutation — all per-cluster data is accessed with
  dynamic slices, never gathers.

- Moller-Trumbore factors bilinearly: with ray features
  f = [d, o, d x o, 1] (10 values) and per-triangle constant columns, the
  four intersection scalars for every (ray, triangle) pair are

      det   = d . (e2 x e1)
      t_num = o . n            - (v0 . n)
      u_num = (d x o) . (-e2)  + d . (-(e2 x v0))
      v_num = (d x o) . e1     + d . (-(v0 x e1))

  so a whole (rays x cluster) block is ONE (R,16)@(16,4C) matmul on the
  MXU, with u = u_num/det etc. decoded on the VPU.

- Per-triangle shading attributes live in per-cluster rows fetched by
  one-hot matmul at hit time, eliminating shading gathers too.

This plays the role the OpenCL BVH2 + TrianglePair buffers play for the
reference's iGPU (Scene.cpp:216-346) — the scene form consumed by the
throughput device — re-derived for a systolic-array machine.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.bvh import Bvh2, KIND_LEAF, build_bvh
from rayaccel_tpu.scene.data import SceneData

RAY_FEATURES = 16   # 10 used: d(3), o(3), d x o(3), 1; padded for the MXU
ATTR_COLS = 32      # per-triangle attribute row
ATTR_TRI_ID_COL = 19  # original triangle id as raw int32 bits (f32 container)
ATTR_GEOM_COL = 20    # [v0, e1, e2] exact geometry rides in cols 20:32 so
                      # winner reconstruction needs ONE row gather
                      # (per-lane gathers are row-count bound, ~90M rows/s)


class ClusterScene(NamedTuple):
    """Device arrays for the MXU backend. N_c clusters of C padded tris."""

    G: jnp.ndarray            # (RAY_FEATURES, N_c*C*4) f32 intersection features
    attrs: jnp.ndarray        # (N_c*C, ATTR_COLS) f32 shading attributes +
                              # exact [v0,e1,e2] geometry (ATTR_GEOM_COL)
    tri_id: jnp.ndarray       # (N_c*C,) int32 original triangle id (-1 pad)
    cl_bbmin: jnp.ndarray     # (N_c, 3) f32
    cl_bbmax: jnp.ndarray     # (N_c, 3) f32
    mat_params: jnp.ndarray   # (M, 4) f32

    @property
    def cluster_size(self) -> int:
        return self.attrs.shape[0] // self.cl_bbmin.shape[0]

    @property
    def n_clusters(self) -> int:
        return self.cl_bbmin.shape[0]


def _cluster_cut(bvh: Bvh2, max_tris: int):
    """Cut the BVH into maximal subtrees with <= max_tris triangles.
    Returns list of (start, end) prim_order ranges + their bounds."""
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        if bvh.kind[i] == KIND_LEAF:
            out.append((int(bvh.first[i]), int(bvh.last[i]),
                        bvh.bbmin[i], bvh.bbmax[i]))
            continue
        # Subtree triangle count = width of its contiguous range; compute by
        # descending to leftmost/rightmost leaves via the shared-window
        # property of the builder.
        lo, hi = _subtree_range(bvh, i)
        if hi - lo <= max_tris:
            out.append((lo, hi, bvh.bbmin[i], bvh.bbmax[i]))
        else:
            stack.append(int(bvh.first[i]))
            stack.append(int(bvh.last[i]))
    out.sort(key=lambda r: r[0])
    return out


def _merge_cut(cut, max_tris: int, sa_gain: float = 0.8):
    """Greedily merge ADJACENT cut ranges (they partition prim_order, so
    adjacency = contiguity) when the union still fits a cluster and its
    bounding box is tight: union surface area <= sa_gain * (sa_a + sa_b).
    The BVH cut descends whenever a subtree exceeds max_tris, which
    strands sibling fragments in half-empty clusters; merging them cuts
    the cluster count the select/cull stages scan per ray without
    increasing expected per-ray overlap (SA ~ hit probability)."""
    def sa(bmin, bmax):
        e = np.maximum(np.asarray(bmax) - np.asarray(bmin), 0.0)
        return 2.0 * (e[0] * e[1] + e[1] * e[2] + e[2] * e[0])

    out = [list(cut[0])]
    for lo, hi, bmin, bmax in cut[1:]:
        plo, phi, pbmin, pbmax = out[-1]
        if hi - plo <= max_tris:
            ubmin = np.minimum(pbmin, bmin)
            ubmax = np.maximum(pbmax, bmax)
            if sa(ubmin, ubmax) <= sa_gain * (sa(pbmin, pbmax)
                                              + sa(bmin, bmax)):
                out[-1] = [plo, hi, ubmin, ubmax]
                continue
        out.append([lo, hi, bmin, bmax])
    return [tuple(x) for x in out]


def _subtree_range(bvh: Bvh2, i: int):
    j = i
    while bvh.kind[j] != KIND_LEAF:
        j = int(bvh.first[j])
    lo = int(bvh.first[j])
    j = i
    while bvh.kind[j] != KIND_LEAF:
        j = int(bvh.last[j])
    hi = int(bvh.last[j])
    return lo, hi


def _tri_feature_columns(v0, e1, e2):
    """Feature columns (16, 4) per triangle for the bilinear MT form."""
    n = np.cross(e1, e2)
    cols = np.zeros((len(v0), RAY_FEATURES, 4), np.float64)
    # det = d . (e2 x e1)
    cols[:, 0:3, 0] = np.cross(e2, e1)
    # u_num = (d x o) . (-e2) + d . (-(e2 x v0))
    cols[:, 6:9, 1] = -e2
    cols[:, 0:3, 1] = -np.cross(e2, v0)
    # v_num = (d x o) . e1 + d . (-(v0 x e1))
    cols[:, 6:9, 2] = e1
    cols[:, 0:3, 2] = -np.cross(v0, e1)
    # t_num = o . n - v0 . n
    cols[:, 3:6, 3] = n
    cols[:, 9, 3] = -np.sum(v0 * n, axis=-1)
    return cols.astype(np.float32)


def compile_clusters(scene: SceneData, cluster_size: int = 128,
                     bvh: Bvh2 | None = None) -> ClusterScene:
    """Compile a SceneData into the cluster-dense device form."""
    verts = np.asarray(scene.vertices, np.float64)
    idx = np.asarray(scene.indices, np.int64)
    if bvh is None:
        bvh = build_bvh(scene.vertices, idx, max_leaf=min(cluster_size, 127))

    cut = _merge_cut(_cluster_cut(bvh, cluster_size), cluster_size)
    n_c = len(cut)
    C = cluster_size
    TP = n_c * C

    tri_id = np.full(TP, -1, np.int64)
    cl_bbmin = np.zeros((n_c, 3), np.float32)
    cl_bbmax = np.zeros((n_c, 3), np.float32)
    for c, (lo, hi, bmin, bmax) in enumerate(cut):
        ids = bvh.prim_order[lo:hi]
        tri_id[c * C:c * C + len(ids)] = ids
        cl_bbmin[c] = bmin
        cl_bbmax[c] = bmax

    # Geometry features (zero columns for padding => det = 0 => never hit).
    G = np.zeros((TP, RAY_FEATURES, 4), np.float32)
    real = tri_id >= 0
    rid = tri_id[real]
    v0 = verts[idx[rid, 0]]
    v1 = verts[idx[rid, 1]]
    v2 = verts[idx[rid, 2]]
    G[real] = _tri_feature_columns(v0, v1 - v0, v2 - v0)
    # Column layout per cluster: [det(C) | u_num(C) | v_num(C) | t_num(C)]
    # so the tracer can slice each scalar kind contiguously from S = F @ G.
    G = (G.reshape(n_c, C, RAY_FEATURES, 4)
          .transpose(2, 0, 3, 1)            # (16, n_c, 4, C)
          .reshape(RAY_FEATURES, TP * 4)
          .copy())

    # Shading attributes per padded triangle row:
    # [n0(0:3) n1(3:6) n2(6:9) ng(9:12) uv0(12:14) uv1(14:16) uv2(16:18)
    #  mat(18) pad...]
    A = np.zeros((TP, ATTR_COLS), np.float32)
    vn = np.asarray(scene.normals, np.float32)
    vt = np.asarray(scene.texcoords, np.float32)
    A[real, 0:3] = vn[idx[rid, 0]]
    A[real, 3:6] = vn[idx[rid, 1]]
    A[real, 6:9] = vn[idx[rid, 2]]
    A[real, 9:12] = np.asarray(scene.triangle_normals, np.float32)[rid]
    A[real, 12:14] = vt[idx[rid, 0]]
    A[real, 14:16] = vt[idx[rid, 1]]
    A[real, 16:18] = vt[idx[rid, 2]]
    A[real, 18] = np.asarray(scene.triangle_materials, np.float32)[rid]
    # Original triangle id as raw bits (selected with integer ops by the
    # Pallas kernel; -1 bit pattern for padding slots).
    A[:, ATTR_TRI_ID_COL] = tri_id.astype(np.int32).view(np.float32)
    # Exact [v0, e1, e2] for the winner-reconstruction Moller-Trumbore
    # (padding rows stay zero => det = 0, rejected by the hit mask).
    A[real, ATTR_GEOM_COL + 0:ATTR_GEOM_COL + 3] = v0
    A[real, ATTR_GEOM_COL + 3:ATTR_GEOM_COL + 6] = v1 - v0
    A[real, ATTR_GEOM_COL + 6:ATTR_GEOM_COL + 9] = v2 - v0

    return ClusterScene(
        G=jnp.asarray(G),
        attrs=jnp.asarray(A),
        tri_id=jnp.asarray(tri_id, jnp.int32),
        cl_bbmin=jnp.asarray(cl_bbmin),
        cl_bbmax=jnp.asarray(cl_bbmax),
        mat_params=jnp.asarray(scene.materials, jnp.float32),
    )
