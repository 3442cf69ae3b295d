"""Pallas cluster-intersection kernel — the hand-written hot kernel.

The XLA version of the MXU-dense tracer (ops/trace_mxu.py) materializes
the (tile, 4C) matmul output and its decode temporaries to HBM every
cluster step (~0.5GB/step at full wave), and its lockstep loop pays the
slowest tile's cluster count for every tile. This kernel fixes both: the
wave's (tile, cluster) work queue is *exact* (scalar-prefetched, packed
``tile<<16 | cluster`` ids, tile-major and front-to-back within a tile),
and matmul + decode + min-merge all happen in VMEM.

Tuned around measured host facts (docs/PERF_NOTES.md):

- a grid step costs ~3.8us of pipeline overhead regardless of body, so
  each step processes K_PER_STEP clusters as separate input streams;
  per-tile queue runs are padded to multiples of K by repeating the last
  cluster (idempotent: re-tests lose to the best-t they set);
- the VPU decode is the body cost, so the kernel keeps only a packed
  (score | candidate-column) minimum per ray — sign-bit validity tests
  (the Kernels.h:60-91 idiom), approximate-reciprocal ranking, no
  per-candidate selection sums. The winner's exact u/v/t, triangle id and
  shading attributes are reconstructed once per ray at wave end from the
  (cluster, column) slot;
- a front-to-back skip via an SMEM scalar (entry distance vs the tile's
  worst best) drops whole steps, the dense analog of ordered traversal
  with shrinking tMax (Kernels.h:190-198).

Grid sizes adapt to the queue length via a lax.switch over capacity
buckets. Every tile is guaranteed at least one item (cluster 0 is forced
into every tile's mask — testing an extra cluster is conservative-safe
because the triangle test enforces the t range); the tail is padded by
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
from rayaccel_tpu.scene.clusters import (ATTR_COLS, ATTR_GEOM_COL,
                                         ATTR_TRI_ID_COL, RAY_FEATURES,
                                         ClusterScene)
from rayaccel_tpu.types import Hits, Rays, INVALID_TRIANGLE

# Queue capacity buckets, in items per tile (multiples of K_PER_STEP): the
# wrapper dispatches to the smallest bucket that fits via lax.switch (no
# host sync) — typical waves stay in the small buckets, so widening the
# ladder costs them nothing. Per-tile queues are clamped to ``tile_cap``
# (default DEFAULT_TILE_CAP); beyond it a tile's FARTHEST clusters are
# dropped and counted. The old 64 clamp silently truncated grazing
# primary tiles at the horizon silhouette — their winners live in FAR
# clusters, so the whole band rendered as sky (~6% of battlefield pixels
# at >0.1 radiance error; round-5 whole-image oracle finding). 256
# covers every per-tile union measured on the battlefield frame; the
# front-to-back early-out skips most of the extra items once a tile's
# lanes have converged. Bucket capacities are TOTAL items (T x b), so
# only the TOP bucket must cover the worst case — the ladder stays
# short because every lax.switch branch is a compiled kernel variant.
CAP_BUCKETS = (8, 16, 64, 256)
DEFAULT_TILE_CAP = 256
# Default clusters per grid step (K=8 measured 4.22 vs 3.47 ms for K=4 on
# the trimmed kernel, docs/PERF_NOTES.md); override via the ``k_step``
# argument / Configuration.pallas_k_step — not env vars.
K_PER_STEP = 4
OUT_COLS = 8            # [packed score | slot bits | pad...]
_COL_BITS = 7           # candidate column rides in the score's low mantissa
_SIGN = -2147483648     # 0x80000000 as a Python int


def _kernel(items_ref, entries_ref, n_ref, F_ref, *refs, precision,
            k_step=K_PER_STEP):
    # TRANSPOSED layout: rays ride the 128-lane minor axis everywhere —
    # F (16, tile), G (4C, 16), out (OUT_COLS, tile) — so blocks are
    # lane-aligned and the candidate min reduces over sublanes (the
    # lane-crossing variant measured ~10% of whole-frame time; see
    # docs/PERF_NOTES.md and the select kernel's identical fix).
    K = k_step
    G_refs = refs[:K]
    out_ref, worst_ref = refs[K], refs[K + 1]
    C = G_refs[0].shape[1] // 4
    tile = F_ref.shape[2]
    i = pl.program_id(0)

    packed = items_ref[i * K]
    prev = items_ref[jnp.maximum(i - 1, 0) * K]
    first = jnp.logical_or(i == 0, (packed >> 16) != (prev >> 16))
    live = i * K < n_ref[0]

    @pl.when(first)
    def _init():
        # Packed miss state: score = tmax_eff bits (low mantissa noise is
        # irrelevant: any real hit must beat it), slot = -1.
        z = jnp.zeros((OUT_COLS - 2, tile), jnp.float32)
        t0 = jax.lax.bitcast_convert_type(F_ref[0, 11], jnp.int32)
        out_ref[0] = jnp.concatenate([
            F_ref[0, 11][None, :],
            jax.lax.bitcast_convert_type(
                jnp.full((tile,), -1, jnp.int32), jnp.float32)[None, :],
            z,
        ], axis=0)
        worst_ref[0] = jnp.max(jnp.maximum(t0, 0))

    # Front-to-back early-out (positive-float bits order like the floats):
    # the tile releases once the queue cursor passes the farthest lane's
    # best hit. MISS lanes hold ``worst`` at tmax, so mixed sky/geometry
    # tiles scan their whole queue — a per-lane LAST-RELEVANT-ENTRY bound
    # (largest queue key among a lane's overlapped clusters) was built and
    # certified round 5 to fix that, but its cull-side reduction cost
    # 5.8 ms/frame at stage 1 (select_reduce_fusion, hw8 xplane) against a
    # sub-noise kernel win on this scene's tile mix — REVERTED, kept only
    # as the tmax-bound idea in the occlusion kernel (zero cull cost).
    useful = entries_ref[i * K] <= jnp.maximum(worst_ref[0], 0)

    @pl.when(live & useful)
    def _step():
        Fm = F_ref[0]                               # (16, tile)
        cur = out_ref[0]
        tmin = Fm[10][None, :]

        best_i = jax.lax.bitcast_convert_type(cur[0], jnp.int32)
        best_slot = jax.lax.bitcast_convert_type(cur[1], jnp.int32)

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (C, tile), 0)
        for k in range(K):
            S = jax.lax.dot(G_refs[k][0], Fm, precision=precision)
            det = S[0 * C:1 * C]
            u_n = S[1 * C:2 * C]
            v_n = S[2 * C:3 * C]
            t_n = S[3 * C:4 * C]

            det_i = jax.lax.bitcast_convert_type(det, jnp.int32)
            u_i = jax.lax.bitcast_convert_type(u_n, jnp.int32)
            v_i = jax.lax.bitcast_convert_type(v_n, jnp.int32)
            sign_ok = ((u_i ^ det_i) | (v_i ^ det_i)) >= 0
            ad = jnp.abs(det)
            ts = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(t_n, jnp.int32)
                ^ (det_i & _SIGN), jnp.float32)
            # Decode trim (round 3): the t < tmax guard (two ad-muls, a
            # cmp, and the best_f bitcast — a LOOP-CARRIED use of best)
            # is implied by the min-merge against ``best`` (initialized
            # to tmax_eff bits) up to approx-reciprocal noise (~2^-12
            # rel.); tmax never binds for primaries (1e6) and inactive
            # lanes' negative-bits init still rejects everything. The
            # t > tmin guard rides the score domain (epsilon-scale shift
            # of the self-hit cutoff only). ad > 0 is implied (a finite
            # positive score > tmin requires it; ad == 0 yields NaN or
            # +-inf scores, both rejected). Edge test |u+v| <= ad equals
            # |u|+|v| <= ad under sign_ok; when signs differ sign_ok
            # already fails.
            # NOTE: keep the f32 where-on-score + unconditional pack
            # shape — an i32 select against a broadcast miss constant
            # measured 23% SLOWER (docs/PERF_NOTES.md round-3 probes).
            score_q = ts * pl.reciprocal(ad, approx=True)
            valid = (sign_ok & (jnp.abs(u_n + v_n) <= ad)
                     & (score_q > tmin))
            score = jnp.where(valid, score_q, 3e38)
            # Pack the candidate column into the score's low mantissa bits
            # (rel. error 2^-16, under the approx-reciprocal noise).
            sp = ((jax.lax.bitcast_convert_type(score, jnp.int32)
                   | ((1 << _COL_BITS) - 1)) ^ (((1 << _COL_BITS) - 1))
                  | col_ids)
            m = jnp.min(sp, axis=0)
            better = m < best_i
            cluster = items_ref[i * K + k] & 0xFFFF
            best_slot = jnp.where(
                better, cluster * C + (m & ((1 << _COL_BITS) - 1)),
                best_slot)
            best_i = jnp.where(better, m, best_i)

        out_ref[0] = jnp.concatenate([
            jax.lax.bitcast_convert_type(best_i, jnp.float32)[None, :],
            jax.lax.bitcast_convert_type(best_slot, jnp.float32)[None, :],
            cur[2:],
        ], axis=0)
        worst_ref[0] = jnp.max(best_i)


def _cull_and_queue(cs: ClusterScene, o, inv_d, tmin, tmax_eff, T, tile,
                    k_step=K_PER_STEP, tile_cap=DEFAULT_TILE_CAP):
    """Dense cull + front-to-back per-tile work queue (shared by the
    closest-hit and occlusion kernels). Returns (items, entries, n_items,
    overflow): packed ``tile<<16 | cluster`` ids, tile-major, per-tile
    runs padded to ``k_step``, every tile guaranteed >= 1 item."""
    R = T * tile
    n_c = cs.n_clusters
    K = k_step

    t0 = jnp.broadcast_to(tmin[:, None], (R, n_c))
    t1 = jnp.broadcast_to(tmax_eff[:, None], (R, n_c))
    for a in range(3):
        tn = (cs.cl_bbmin[:, a][None, :] - o[a][:, None]) * inv_d[a][:, None]
        tf = (cs.cl_bbmax[:, a][None, :] - o[a][:, None]) * inv_d[a][:, None]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    entry = jnp.where(t0 <= t1, jnp.maximum(t0, 0.0), _INF)
    tile_entry = entry.reshape(T, tile, n_c).min(axis=1)     # (T, N_c)
    # (A per-lane last-relevant-entry reduction lived here in round 5 for
    # one session: max over a lane's overlapped clusters of the tile
    # entry, feeding a per-lane kernel early-out. It cost 5.8 ms/frame at
    # stage 1 — hw8 xplane, select_reduce_fusion x15 — for a sub-noise
    # kernel win, so it was reverted; see the kernel early-out note.)
    tile_entry = tile_entry.at[:, 0].min(0.0)  # force cluster 0 everywhere

    # ONE 2-operand sort yields sorted entries AND the order: an
    # argsort + take_along_axis pair pays a pathological minor-axis
    # gather on (T, n_c) — 0.5 ms per 57k elements, 7.7 ms/frame on the
    # round-4 PT xplane (tools/profile_xplane_pt2.py).
    iota_c = jnp.broadcast_to(
        jnp.arange(tile_entry.shape[1], dtype=jnp.int32)[None, :],
        tile_entry.shape)
    sorted_entry, order = jax.lax.sort((tile_entry, iota_c), num_keys=1,
                                       dimension=1)
    counts = jnp.sum((tile_entry < _INF).astype(jnp.int32), axis=1)
    counts_pad = -(-counts // K) * K
    # Clamp each tile's queue to the largest bucket BEFORE flat packing:
    # oversubscribed tiles drop only their FARTHEST clusters (front-to-back
    # order) and every tile keeps >=1 item, so every output block is
    # written. Global truncation of the flat list would silently zero out
    # trailing tiles instead.
    counts_kept = jnp.minimum(counts_pad, tile_cap)
    # The rank lattice must be wide enough for K-padded counts (counts_pad
    # can exceed n_c for tiny scenes).
    n_cp = -(-n_c // K) * K
    kk = jax.lax.broadcasted_iota(jnp.int32, (T, n_cp), 1)
    k_mask = kk < counts_kept[:, None]

    cap_max = T * tile_cap
    total = jnp.sum(counts_kept)
    # Masked-position extraction via a 1-key sort (jnp.nonzero measured
    # ~10x slower than lax.sort for this, docs/PERF_NOTES.md).
    pos_all = jnp.arange(T * n_cp, dtype=jnp.int32)
    flat_pos = jax.lax.sort(
        jnp.where(k_mask.reshape(-1), pos_all, jnp.int32(0x7FFFFFFF)))
    if T * n_cp < cap_max:          # tiny scenes: every position fits
        flat_pos = jnp.pad(flat_pos, (0, cap_max - T * n_cp),
                           constant_values=0x7FFFFFFF)
    else:
        flat_pos = flat_pos[:cap_max]
    n_items = total
    last = flat_pos[jnp.maximum(n_items - 1, 0)]
    lane = jnp.arange(cap_max)
    flat_pos = jnp.where(lane < n_items, flat_pos, last)
    item_tile = (flat_pos // n_cp).astype(jnp.int32)
    # Clamp the within-tile rank to the real count: padding repeats the
    # tile's last (farthest) cluster — idempotent in the kernel.
    rank = jnp.minimum((flat_pos % n_cp).astype(jnp.int32),
                       jnp.take(counts, item_tile) - 1)
    src = item_tile * n_c + rank
    item_cluster = jnp.take(order.reshape(-1), src).astype(jnp.int32)
    items = (item_tile << 16) | item_cluster
    entries = jax.lax.bitcast_convert_type(
        jnp.take(sorted_entry.reshape(-1), src), jnp.int32)
    overflow = jnp.sum(jnp.maximum(counts - counts_kept, 0))
    return items, entries, n_items, overflow


def _occl_kernel(items_ref, entries_ref, n_ref, F_ref, *refs, precision,
                 k_step=K_PER_STEP):
    """Any-hit work-queue kernel: per-lane occluded flags, whole-tile
    early-out once every lane is occluded (the any-hit analog of the
    traversal kernel's early-exit semantics, Kernels.h:190-210)."""
    K = k_step
    G_refs = refs[:K]
    out_ref, worst_ref = refs[K], refs[K + 1]
    C = G_refs[0].shape[1] // 4
    tile = F_ref.shape[2]
    i = pl.program_id(0)

    packed = items_ref[i * K]
    prev = items_ref[jnp.maximum(i - 1, 0) * K]
    first = jnp.logical_or(i == 0, (packed >> 16) != (prev >> 16))
    live = i * K < n_ref[0]

    @pl.when(first)
    def _init():
        out_ref[0] = jnp.zeros((OUT_COLS, tile), jnp.float32)
        t0 = jax.lax.bitcast_convert_type(F_ref[0, 11], jnp.int32)
        worst_ref[0] = jnp.max(jnp.maximum(t0, 0))

    # Per-lane tmax early-out: a lane is relevant while UNOCCLUDED and
    # its tmax (finite for shadow rays — the light distance) is ahead of
    # the queue cursor; occluded lanes drop to bound 0. Strictly better
    # than the previous all-occluded flag (every unoccluded lane forced
    # a FULL queue scan) at ZERO cull-side cost — the richer per-lane
    # last-relevant-entry bound certified mid-round-5 cost 5.8 ms/frame
    # of cull reduction (hw8 xplane) and was reverted.
    useful = entries_ref[i * K] <= jnp.maximum(worst_ref[0], 0)

    @pl.when(live & useful)
    def _step():
        Fm = F_ref[0]                               # (16, tile)
        tmin = Fm[10][None, :]
        tmax = Fm[11][None, :]
        occ = out_ref[0][0] > 0
        for k in range(K):
            S = jax.lax.dot(G_refs[k][0], Fm, precision=precision)
            det = S[0 * C:1 * C]
            u_n = S[1 * C:2 * C]
            v_n = S[2 * C:3 * C]
            t_n = S[3 * C:4 * C]
            det_i = jax.lax.bitcast_convert_type(det, jnp.int32)
            u_i = jax.lax.bitcast_convert_type(u_n, jnp.int32)
            v_i = jax.lax.bitcast_convert_type(v_n, jnp.int32)
            sign_ok = ((u_i ^ det_i) | (v_i ^ det_i)) >= 0
            ad = jnp.abs(det)
            ts = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(t_n, jnp.int32)
                ^ (det_i & _SIGN), jnp.float32)
            valid = (sign_ok & (jnp.abs(u_n + v_n) <= ad)
                     & (ts > ad * tmin) & (ts <= ad * tmax))
            occ = occ | jnp.any(valid, axis=0)
        out_ref[0] = jnp.concatenate(
            [occ.astype(jnp.float32)[None, :],
             jnp.zeros((OUT_COLS - 1, tile), jnp.float32)], axis=0)
        t0 = jax.lax.bitcast_convert_type(Fm[11], jnp.int32)
        worst_ref[0] = jnp.max(jnp.where(occ, 0, jnp.maximum(t0, 0)))


def _make_occl_call(cap, T, tile, C, precision, interpret,
                    k_step=K_PER_STEP):
    K = k_step
    kern = partial(_occl_kernel, precision=precision, k_step=k_step)

    def g_spec(k):
        return pl.BlockSpec(
            (1, 4 * C, RAY_FEATURES),
            lambda i, items, entries, n, k=k: (items[i * K + k] & 0xFFFF,
                                               0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap // K,),
        in_specs=[
            pl.BlockSpec((1, RAY_FEATURES, tile),
                         lambda i, items, entries, n: (items[i * K] >> 16,
                                                       0, 0)),
        ] + [g_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec(
            (1, OUT_COLS, tile),
            lambda i, items, entries, n: (items[i * K] >> 16, 0, 0)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def call(items, entries, n_items, F, G3):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, OUT_COLS, tile), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(items[:cap], entries[:cap], n_items[None], F, *([G3] * K))

    return call


@partial(jax.jit, static_argnames=("tile", "precision", "interpret",
                                   "k_step", "tile_cap"))
def trace_occlusion_pallas(cs: ClusterScene, rays: Rays,
                           active: jnp.ndarray | None = None,
                           tile: int = 512,
                           precision: str = "highest",
                           interpret: bool | None = None,
                           k_step: int = K_PER_STEP,
                           tile_cap: int = DEFAULT_TILE_CAP) -> jnp.ndarray:
    """Any-hit occlusion query on the Pallas work-queue engine: True where
    some triangle blocks the ray within [tmin, tmax]. Cheaper than the
    closest-hit kernel: no winner tracking or reconstruction, and a tile
    retires from the queue once every lane is occluded."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic supports HIGHEST (fp32) and DEFAULT (one-pass bf16) only.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
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

    items, entries, n_items, _ = _cull_and_queue(
        cs, o, inv_d, tmin, tmax_eff, T, tile, k_step=k_step,
        tile_cap=tile_cap)

    F = _ray_features(o, d)
    F = (F.at[:, 10].set(tmin).at[:, 11].set(tmax_eff)
         .T.reshape(RAY_FEATURES, T, tile).transpose(1, 0, 2))
    G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 2, 0)

    buckets = [b for b in CAP_BUCKETS if b < tile_cap] + [tile_cap]
    calls = [_make_occl_call(T * b, T, tile, C, prec, interpret,
                             k_step=k_step)
             for b in buckets]
    branch = sum((n_items > T * b).astype(jnp.int32) for b in buckets[:-1])
    out = jax.lax.switch(branch, calls, items, entries, n_items, F, G3)
    return out[:, 0, :].reshape(R) > 0


def _make_call(cap, T, tile, C, precision, interpret, k_step=K_PER_STEP):
    K = k_step
    kern = partial(_kernel, precision=precision, k_step=k_step)

    def g_spec(k):
        return pl.BlockSpec(
            (1, 4 * C, RAY_FEATURES),
            lambda i, items, entries, n, k=k: (items[i * K + k] & 0xFFFF,
                                               0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap // K,),
        in_specs=[
            pl.BlockSpec((1, RAY_FEATURES, tile),
                         lambda i, items, entries, n: (items[i * K] >> 16,
                                                       0, 0)),
        ] + [g_spec(k) for k in range(K)],
        out_specs=pl.BlockSpec(
            (1, OUT_COLS, tile),
            lambda i, items, entries, n: (items[i * K] >> 16, 0, 0)),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )

    def call(items, entries, n_items, F, G3):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, OUT_COLS, tile), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(items[:cap], entries[:cap], n_items[None], F, *([G3] * K))

    return call


@partial(jax.jit, static_argnames=("tile", "precision", "interpret",
                                   "k_step", "tile_cap"))
def trace_mxu_pallas(cs: ClusterScene, rays: Rays,
                     env: Environment | None = None,
                     active: jnp.ndarray | None = None, tile: int = 512,
                     precision: str = "highest",
                     interpret: bool | None = None,
                     k_step: int = K_PER_STEP,
                     tile_cap: int = DEFAULT_TILE_CAP):
    """Pallas-kernel variant of trace_mxu. Returns (MxuHits, overflow)."""
    if interpret is None:  # Mosaic requires hardware; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    # Mosaic supports HIGHEST (fp32) and DEFAULT (one-pass bf16) only.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
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

    # ---- dense cull + front-to-back per-tile work queue ----
    items, entries, n_items, overflow = _cull_and_queue(
        cs, o, inv_d, tmin, tmax_eff, T, tile, k_step=k_step,
        tile_cap=tile_cap)

    # ---- ray features (tmin/tmax packed into zero-G rows 10/11) ----
    F = _ray_features(o, d)
    F = (F.at[:, 10].set(tmin).at[:, 11].set(tmax_eff)
         .T.reshape(RAY_FEATURES, T, tile).transpose(1, 0, 2))
    G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 2, 0)

    buckets = [b for b in CAP_BUCKETS if b < tile_cap] + [tile_cap]
    calls = [_make_call(T * b, T, tile, C, prec, interpret, k_step=k_step)
             for b in buckets]
    branch = sum((n_items > T * b).astype(jnp.int32) for b in buckets[:-1])
    out = jax.lax.switch(branch, calls, items, entries, n_items, F, G3)

    slot = jax.lax.bitcast_convert_type(out[:, 1, :], jnp.int32).reshape(R)
    hit = slot >= 0
    slot_safe = jnp.where(hit, slot, 0)

    # ---- winner reconstruction: ONE per-ray row gather + exact MT ----
    # (gathers are row-count bound, so triangle id + geometry + shading
    # attributes all ride the same ATTR_COLS row, scene/clusters.py:45-50)
    attr = jnp.take(cs.attrs, slot_safe, axis=0)           # (R, ATTR_COLS)
    tri = jax.lax.bitcast_convert_type(attr[:, ATTR_TRI_ID_COL], jnp.int32)

    v0 = attr[:, ATTR_GEOM_COL + 0:ATTR_GEOM_COL + 3]
    e1 = attr[:, ATTR_GEOM_COL + 3:ATTR_GEOM_COL + 6]
    e2 = attr[:, ATTR_GEOM_COL + 6:ATTR_GEOM_COL + 9]
    pvec = jnp.cross(rays.d, e2)
    det = jnp.sum(pvec * e1, axis=-1)
    inv = 1.0 / jnp.where(det == 0, 1.0, det)
    tvec = rays.o - v0
    u = jnp.sum(pvec * tvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(qvec * rays.d, axis=-1) * inv
    t = jnp.sum(qvec * e2, axis=-1) * inv

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
