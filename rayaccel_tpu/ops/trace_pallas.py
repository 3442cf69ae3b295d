"""Pallas cluster-intersection kernel — the hand-written hot kernel.

The XLA version of the MXU-dense tracer (ops/trace_mxu.py) materializes
the (tile, 4C) matmul output and its decode temporaries to HBM every
cluster step (~0.5GB/step at full wave), and its lockstep loop pays the
slowest tile's cluster count for every tile. This kernel fixes both:

- The wave's (tile, cluster) work queue is *exact*: one grid step per
  overlapping pair, scalar-prefetched as packed ``tile<<16 | cluster``
  ids; a tile with 3 clusters costs 3 steps (no lockstep inflation).
- Matmul + decode + argmin + best-merge all happen in VMEM; HBM sees only
  the cluster blocks (streamed by the Pallas pipeline via
  scalar-prefetched index maps, the embedding-lookup pattern) and one
  write of each tile's packed best-hit block (output blocks stay resident
  in VMEM across consecutive steps of the same tile).

The decode is the VPU-bound part (~tile x C lanes per step), so it is cut
to the bone:

- per-tile items are ordered FRONT TO BACK and carry their conservative
  entry distance; a step whose cluster entry cannot beat any ray's
  current best skips its whole body (the dense analog of ordered
  traversal with tMax shrinking, Kernels.h:190-198);
- validity uses the reference kernel's sign-bit tricks (Kernels.h:60-91)
  on raw bit patterns;
- the u/v/t division happens once per ray for the winning candidate, not
  per candidate.

Grid sizes adapt to the actual queue length by a lax.switch over capacity
buckets; triangle ids ride inside the attribute block as bit patterns.
Every tile is guaranteed at least one item (cluster 0 is forced into
every tile's mask — testing an extra cluster is conservative-safe because
the triangle test itself enforces the t range), and the tail is padded by
repeating the last real item so padded steps neither re-initialize nor
recompute anything.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayaccel_tpu.environment import Environment, sample_environment_onehot
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.ops.trace_mxu import MxuHits, _INF, _ray_features
from rayaccel_tpu.scene.clusters import (ATTR_COLS, ATTR_TRI_ID_COL,
                                         RAY_FEATURES, ClusterScene)
from rayaccel_tpu.types import Hits, Rays, INVALID_TRIANGLE

# Queue capacity buckets, in items per tile: the wrapper dispatches to the
# smallest bucket that fits the wave's actual queue (lax.switch, no host
# sync). The largest bucket is the hard cap; beyond it the farthest work
# is dropped and reported.
CAP_BUCKETS = (8, 16, 32, 64)
# Packed output row: [winning u_n, v_n, t_n, ad | attr(32) | t | tri bits].
OUT_COLS = 64
_O_UN, _O_VN, _O_TN, _O_AD = 32, 33, 34, 35
_O_T, _O_TRI = 36, 37
_SIGN = -2147483648  # 0x80000000 as a Python int (jnp consts cannot be captured by kernels)


def _kernel(items_ref, entries_ref, n_ref, F_ref, G_ref, A_ref, out_ref,
            worst_ref, *, precision):
    C = G_ref.shape[2] // 4
    tile = F_ref.shape[1]
    i = pl.program_id(0)

    packed = items_ref[i]
    prev = items_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, (packed >> 16) != (prev >> 16))
    live = i < n_ref[0]

    @pl.when(first)
    def _init():
        tri_bits = jax.lax.bitcast_convert_type(
            jnp.full((tile,), INVALID_TRIANGLE, jnp.int32), jnp.float32)
        out_ref[0] = jnp.concatenate([
            jnp.zeros((tile, 32), jnp.float32),
            jnp.zeros((tile, 4), jnp.float32),
            F_ref[0, :, 11][:, None],            # best t = tmax_eff
            tri_bits[:, None],
            jnp.zeros((tile, OUT_COLS - 38), jnp.float32),
        ], axis=1)
        # Per-tile worst current best, kept as an SMEM int32 (float bits;
        # int order == float order for the non-negative range) so the
        # front-to-back skip below never touches the output block outside
        # its pl.when (an out_ref read here serialized the pipeline, 10x).
        worst_ref[0] = jnp.max(
            jax.lax.bitcast_convert_type(F_ref[0, :, 11], jnp.int32))

    # Front-to-back early-out: skip the whole body when this cluster's
    # conservative entry distance cannot beat any ray's current best (the
    # dense analog of ordered traversal with shrinking tMax,
    # Kernels.h:190-198). Entry values are pre-bitcast ints; positive
    # floats order identically as ints.
    useful = entries_ref[i] <= jnp.maximum(worst_ref[0], 0)

    @pl.when(live & useful)
    def _step():
        Fm = F_ref[0]                               # (tile, 16)
        S = jax.lax.dot(Fm, G_ref[0], precision=precision)  # (tile, 4C)
        det = S[:, 0 * C:1 * C]
        u_n = S[:, 1 * C:2 * C]
        v_n = S[:, 2 * C:3 * C]
        t_n = S[:, 3 * C:4 * C]

        cur = out_ref[0]                            # (tile, OUT_COLS)
        best_t = cur[:, _O_T]

        # Sign-bit validity (the bit tricks of Kernels.h:60-91): u, v and
        # t all flip by det's sign; inside = sign(u)==sign(v)==sign(det)
        # and |u|+|v| <= |det|.
        det_i = jax.lax.bitcast_convert_type(det, jnp.int32)
        u_i = jax.lax.bitcast_convert_type(u_n, jnp.int32)
        v_i = jax.lax.bitcast_convert_type(v_n, jnp.int32)
        sign_ok = ((u_i ^ det_i) | (v_i ^ det_i)) >= 0
        ad = jnp.abs(det)
        au = jnp.abs(u_n)
        av = jnp.abs(v_n)
        ts = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(t_n, jnp.int32) ^ (det_i & _SIGN),
            jnp.float32)
        tmin = Fm[:, 10][:, None]
        valid = (sign_ok & (au + av <= ad) & (ad > 0)
                 & (ts > ad * tmin) & (ts < ad * best_t[:, None]))
        score = jnp.where(valid, ts * pl.reciprocal(ad, approx=True), 3e38)

        j = jnp.argmin(score, axis=1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, C), 1)
                  == j[:, None])
        tj = jnp.min(score, axis=1)
        better = tj < best_t

        sel = onehot & better[:, None]
        sel_f = sel.astype(jnp.float32)
        # Raw numerators/denominator of the winner; the exact divide
        # happens once per ray in the wrapper.
        un_j = jnp.sum(jnp.where(sel, u_n, 0.0), axis=1)
        vn_j = jnp.sum(jnp.where(sel, v_n, 0.0), axis=1)
        tn_j = jnp.sum(jnp.where(sel, ts, 0.0), axis=1)
        ad_j = jnp.sum(jnp.where(sel, det, 0.0), axis=1)
        attr_j = jax.lax.dot(sel_f, A_ref[0],
                             precision=jax.lax.Precision.HIGHEST)
        ids_i = jax.lax.bitcast_convert_type(A_ref[0][:, ATTR_TRI_ID_COL],
                                             jnp.int32)
        tri_j = jnp.sum(jnp.where(sel, ids_i[None, :], 0), axis=1)
        tri_cur = jax.lax.bitcast_convert_type(cur[:, _O_TRI], jnp.int32)
        tri_new = jax.lax.bitcast_convert_type(
            jnp.where(better, tri_j, tri_cur), jnp.float32)

        bb = better[:, None]
        out_ref[0] = jnp.concatenate([
            jnp.where(bb, attr_j, cur[:, 0:32]),
            jnp.where(better, un_j, cur[:, _O_UN])[:, None],
            jnp.where(better, vn_j, cur[:, _O_VN])[:, None],
            jnp.where(better, tn_j, cur[:, _O_TN])[:, None],
            jnp.where(better, ad_j, cur[:, _O_AD])[:, None],
            jnp.where(better, tj, best_t)[:, None],
            tri_new[:, None],
            cur[:, 38:],
        ], axis=1)
        worst_ref[0] = jnp.max(jax.lax.bitcast_convert_type(
            jnp.where(better, tj, best_t), jnp.int32))


def _make_call(cap, T, tile, C, precision, interpret):
    kern = partial(_kernel, precision=precision)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, tile, RAY_FEATURES),
                         lambda i, items, entries, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, RAY_FEATURES, 4 * C),
                         lambda i, items, entries, n: (items[i] & 0xFFFF, 0, 0)),
            pl.BlockSpec((1, C, ATTR_COLS),
                         lambda i, items, entries, n: (items[i] & 0xFFFF, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, OUT_COLS),
            lambda i, items, entries, n: (items[i] >> 16, 0, 0)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def call(items, entries, n_items, F, G3, A3):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, tile, OUT_COLS), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(items[:cap], entries[:cap], n_items[None], F, G3, A3)

    return call


@partial(jax.jit, static_argnames=("tile", "precision", "interpret"))
def trace_mxu_pallas(cs: ClusterScene, rays: Rays,
                     env: Environment | None = None,
                     active: jnp.ndarray | None = None, tile: int = 512,
                     precision: str = "highest",
                     interpret: bool | None = None):
    """Pallas-kernel variant of trace_mxu. Returns (MxuHits, overflow)
    where ``overflow`` counts (tile, cluster) pairs dropped because even
    the largest work-queue bucket was exceeded (0 in healthy
    configurations; rises only for extremely incoherent ray tiles; the
    dropped items are each tile's farthest clusters)."""
    if interpret is None:  # Mosaic requires hardware; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.HIGH)
    R = rays.o.shape[0]
    assert R % tile == 0
    T = R // tile
    C = cs.cluster_size
    n_c = cs.n_clusters

    o = tuple(rays.o[:, a] for a in range(3))
    inv3 = safe_inv_dir(rays.d)
    d = tuple(rays.d[:, a] for a in range(3))
    inv_d = tuple(inv3[:, a] for a in range(3))
    tmin = rays.tmin
    tmax_eff = rays.tmax if active is None else jnp.where(active, rays.tmax, -1.0)

    # ---- dense cull (shared logic with trace_mxu) ----
    t0 = jnp.broadcast_to(tmin[:, None], (R, n_c))
    t1 = jnp.broadcast_to(tmax_eff[:, None], (R, n_c))
    for a in range(3):
        tn = (cs.cl_bbmin[:, a][None, :] - o[a][:, None]) * inv_d[a][:, None]
        tf = (cs.cl_bbmax[:, a][None, :] - o[a][:, None]) * inv_d[a][:, None]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    entry = jnp.where(t0 <= t1, jnp.maximum(t0, 0.0), _INF)
    tile_entry = entry.reshape(T, tile, n_c).min(axis=1)     # (T, N_c)
    tile_entry = tile_entry.at[:, 0].min(0.0)  # force cluster 0 everywhere

    # ---- front-to-back work queue, tile-major ----
    order = jnp.argsort(tile_entry, axis=1)                  # (T, N_c)
    sorted_entry = jnp.take_along_axis(tile_entry, order, axis=1)
    counts = jnp.sum((tile_entry < _INF).astype(jnp.int32), axis=1)
    k_mask = (jax.lax.broadcasted_iota(jnp.int32, (T, n_c), 1)
              < counts[:, None])

    cap_max = T * CAP_BUCKETS[-1]
    total = jnp.sum(counts)
    flat_pos = jnp.nonzero(k_mask.reshape(-1), size=cap_max, fill_value=0)[0]
    n_items = jnp.minimum(total, cap_max)
    last = flat_pos[jnp.maximum(n_items - 1, 0)]
    lane = jnp.arange(cap_max)
    flat_pos = jnp.where(lane < n_items, flat_pos, last)
    item_tile = (flat_pos // n_c).astype(jnp.int32)
    item_cluster = jnp.take(order.reshape(-1), flat_pos).astype(jnp.int32)
    items = (item_tile << 16) | item_cluster
    entries_f = jnp.take(sorted_entry.reshape(-1), flat_pos)
    entries = jax.lax.bitcast_convert_type(entries_f, jnp.int32)
    overflow = jnp.maximum(total - cap_max, 0)

    # ---- ray-side features, (T, tile, 16) with tmin/tmax in cols 10/11
    # (G rows 10..15 are zero so the packing is invisible to the dot) ----
    F = _ray_features(o, d)
    F = F.at[:, 10].set(tmin).at[:, 11].set(tmax_eff).reshape(T, tile,
                                                              RAY_FEATURES)
    G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 0, 2)
    A3 = cs.attrs.reshape(n_c, C, ATTR_COLS)

    # ---- capacity-bucketed dispatch: pay grid steps ~ actual queue ----
    calls = [_make_call(T * b, T, tile, C, prec, interpret)
             for b in CAP_BUCKETS]
    branch = sum((n_items > T * b).astype(jnp.int32) for b in CAP_BUCKETS[:-1])
    out = jax.lax.switch(branch, calls, items, entries, n_items, F, G3, A3)

    attr = out[:, :, 0:32].reshape(R, 32)
    un = out[:, :, _O_UN].reshape(R)
    vn = out[:, :, _O_VN].reshape(R)
    tn = out[:, :, _O_TN].reshape(R)
    det = out[:, :, _O_AD].reshape(R)
    tri = jax.lax.bitcast_convert_type(out[:, :, _O_TRI],
                                       jnp.int32).reshape(R)

    hit = tri >= 0
    # Exact once-per-ray division; u/v carry det's sign like t does.
    rcp = 1.0 / jnp.where(det == 0, 1.0, jnp.abs(det))
    sgn = jnp.where(det < 0, -1.0, 1.0)
    t = tn * rcp
    u = un * sgn * rcp
    v = vn * sgn * rcp

    if env is not None:
        miss_rgb = sample_environment_onehot(env, rays.d)
        mask = hit if active is None else (hit | ~active)
        miss_rgb = jnp.where(mask[:, None], 0.0, miss_rgb)
    else:
        miss_rgb = jnp.zeros((R, 3), jnp.float32)

    hits = Hits(
        tri=jnp.where(hit, tri, INVALID_TRIANGLE),
        t=jnp.where(hit, t, rays.tmax),
        u=jnp.where(hit, u, 0.0),
        v=jnp.where(hit, v, 0.0),
        miss_rgb=miss_rgb,
    )
    return MxuHits(hits=hits, attrs=attr), overflow
