"""Pair-centric sparse tracer — bounce-ray engine.

The dense tile engines (ops/trace_mxu.py, ops/trace_pallas.py) pay
``tile_union x C`` intersection tests per ray: every ray in a tile tests
every cluster ANY ray of the tile overlaps. Primary tiles union ~7
clusters, but bounce tiles union 80-140 even after regrouping, while the
per-ray overlap is only ~2.0 (docs/PERF_NOTES.md) — a ~40x dense-work
multiplier. This engine makes work scale with the ACTUAL overlap: each
(ray, cluster) overlap pair becomes one lane of a flat work array.

Pipeline (all sizes static; measured costs for a 65k wave in brackets):

1. Dense cull: entry distances for every (ray, cluster) [0.1ms].
2. Nearest-K selection per ray: K rounds of masked argmin-extract over
   the entry matrix build a (K, R) lattice of cluster ids, nearest
   first — so clamping a ray's overlap set to K drops only its FARTHEST
   clusters (jax.lax.top_k measured 6.7ms; this is ~K passes of 0.1ms).
3. Flatten + sort pairs by cluster (dead pairs last) [0.4ms], truncate
   to MAXP (counted in ``overflow``), gather each pair's ray-feature row
   [3ms — the dominant per-pair cost].
4. Pallas work-queue kernel over (block, cluster) items: blocks are
   SP_TILE-pair slices of the sorted array; an item per distinct cluster
   per block (run boundaries). Each item is one (SP_TILE,16)@(16,4C)
   MXU matmul; lanes of other clusters in the block are masked. Item
   count ~= pairs/SP_TILE + cluster runs — independent of tile unions.
5. Merge: per-pair packed (score | rank | column) scatter-mins into a
   per-ray best [1.8ms]; the winning pair's cluster comes from the (K, R)
   lattice by rank; exact fp32 Moller-Trumbore refine of the winner (the
   same reconstruction the dense pallas kernel uses).

The reference analog is ordered traversal visiting only overlapped nodes
(Kernels.h:169-211): per-ray work proportional to per-ray overlap. This
engine is that property rebuilt for a machine that wants flat lanes and
dense matmuls instead of per-ray stacks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayaccel_tpu.environment import Environment, sample_environment_onehot
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.ops.trace_mxu import MxuHits, _INF
from rayaccel_tpu.scene.clusters import (ATTR_GEOM_COL, ATTR_TRI_ID_COL,
                                         RAY_FEATURES, ClusterScene)
from rayaccel_tpu.types import Hits, Rays, INVALID_TRIANGLE

OUT_COLS = 8
_SIGN = -2147483648
_RANK_SHIFT = 20          # rank rides above the cluster id in lane words
_CL_MASK = (1 << _RANK_SHIFT) - 1
_DEAD_CLUSTER = 1 << 16   # sorts after every real cluster id
_MISS_BITS = 0x7F000000   # packed-score miss marker (huge positive float)
_MISS_F32 = float(__import__("numpy").int32(_MISS_BITS).view(
    __import__("numpy").float32))  # same bits as a host float constant

# Packed-lattice-sort bit budget: (cluster, ray, rank) must fit one
# uint32 sort key, else the 2-operand (keys, payload) sort is used.
# Module-level so tests can force the fallback path (monkeypatch to 0)
# and assert both orders produce identical hits.
PACKED_SORT_MAX_BITS = 32

# Work-queue capacity buckets (items): dispatch picks the smallest that
# fits, so sparse waves don't pay the worst case's grid-step tax.
# Measured (profile_xplane, round 3): restart passes land ~860 items and
# frame-width pass-1 ~1.9k, so the middle bucket sits at 1024 — the old
# (128, 512, 2048) ladder ran 2048 steps (~4.5ms of pure step tax) for
# every restart.
ITEM_BUCKETS = (128, 1024, 2048)


def _kernel(items_ref, n_ref, F_ref, G_ref, out_ref, *, col_bits,
            precision, guard_tmax=True):
    """One item = (pair block, cluster): intersect the block's rays with
    the cluster, write packed (score | rank | col) for the lanes whose
    pair IS this cluster. A lane belongs to exactly one cluster, so
    exactly one item writes it; the first item of each block initializes
    the whole block to the miss marker.

    The per-lane word (cluster | rank << 20) rides as raw bits in the
    gathered F row's unused column 12 (a denormal float; the matching G
    rows are zero, so it contributes nothing to the matmul) — a separate
    int input block would violate the TPU (8, 128) block-shape rule.

    NOTE (round 3): an 8-column-gather variant that rebuilt the bilinear
    cross-term rows in-kernel produced silently WRONG hits on hardware
    (correct in interpret mode) in two different formulations (register
    concatenate AND scratch row-writes) — a Mosaic lowering issue around
    assembling a matmul operand from computed rows. Reverted to the
    16-column gather; see docs/PERF_NOTES.md before retrying."""
    # TRANSPOSED layout: pairs on the 128-lane minor axis (F (16, sp),
    # G (4C, 16), out (OUT_COLS, sp)) — lane-aligned blocks, sublane-axis
    # candidate min (see the select kernel's identical fix).
    C = G_ref.shape[1] // 4
    sp = F_ref.shape[2]
    i = pl.program_id(0)

    packed_item = items_ref[i]
    prev_item = items_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, (packed_item >> 16) != (prev_item >> 16))
    live = i < n_ref[0]

    @pl.when(first)
    def _init():
        # Host-computed float with the _MISS_BITS pattern (Mosaic cannot
        # bitcast scalars in-kernel).
        out_ref[0] = jnp.full((OUT_COLS, sp), _MISS_F32, jnp.float32)

    @pl.when(live)
    def _step():
        Fm = F_ref[0]                                   # (16, sp)
        cluster = packed_item & 0xFFFF
        lanes = jax.lax.bitcast_convert_type(Fm[12], jnp.int32)
        mask = (lanes & _CL_MASK) == cluster
        rank = jax.lax.shift_right_logical(lanes, _RANK_SHIFT)

        tmin = Fm[10][None, :]
        S = jax.lax.dot(G_ref[0], Fm, precision=precision)
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
        # Decode trim (round 5; the round-3 dense-kernel trim class
        # applied here — this body is VPU-DECODE-bound, not
        # grid-tax-bound: ~25 ops x C x sp per item ~= 3.3us/step
        # accounts for the measured ~3.8us/item, so every op counts).
        # |u|+|v| <= ad equals |u+v| <= ad under sign_ok. The tmin test
        # stays EXACT (tmin here is the restart-window boundary tlo, a
        # multipass correctness edge — unlike the dense kernel, where
        # tmin is only the self-hit epsilon). The reciprocal is
        # approximate (2^-12 ranking noise under the existing 2^-13
        # low-bit packing — the winner is refined exactly afterwards).
        valid = sign_ok & (jnp.abs(u_n + v_n) <= ad) & (ts > ad * tmin)
        if guard_tmax:
            # The any-hit consumer (occlusion) defines truth by the
            # [tmin, tmax] window, so the window test stays exact.
            # Closest-hit drops it: pass-1 tmax is 1e6 (never binds; dead
            # lanes have no pairs) and restart tmax only re-excludes
            # hits beyond the current best, which the min-merge already
            # rejects (packed ordering is monotone in score).
            tmax = Fm[11][None, :]
            valid = valid & (ts < ad * tmax)
        score = jnp.where(valid, ts * pl.reciprocal(ad, approx=True),
                          3e38)

        # Pack candidate column + pair rank into the score's low mantissa
        # (col_bits + 3 bits; rel. error ~2^-13 — only reorders candidates
        # closer than that, and the winner is refined exactly afterwards).
        low = (1 << (col_bits + 3)) - 1
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (C, sp), 0)
        sp_bits = (((jax.lax.bitcast_convert_type(score, jnp.int32) | low)
                    ^ low)
                   | (rank[None, :] << col_bits) | col_ids)
        m = jnp.min(sp_bits, axis=0)                     # (sp,)

        cur = jax.lax.bitcast_convert_type(out_ref[0][0], jnp.int32)
        new = jnp.where(mask, jnp.minimum(m, cur), cur)
        out_ref[0] = jnp.concatenate([
            jax.lax.bitcast_convert_type(new, jnp.float32)[None, :],
            out_ref[0][1:],
        ], axis=0)


def _make_call(n_steps, B, sp, C, col_bits, precision, interpret,
               guard_tmax=True):
    kern = partial(_kernel, col_bits=col_bits, precision=precision,
                   guard_tmax=guard_tmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, RAY_FEATURES, sp),
                         lambda i, items, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, 4 * C, RAY_FEATURES),
                         lambda i, items, n: (items[i] & 0xFFFF, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, OUT_COLS, sp),
            lambda i, items, n: (items[i] >> 16, 0, 0)),
    )

    def call(items, n_items, Fp, G3):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, OUT_COLS, sp), jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(items[:n_steps], n_items[None], Fp, G3)

    return call


_INF_PACK = 0x7F800000    # +inf bit pattern: packed-entry invalid threshold


def _select_kernel(tl_ref, F8_ref, bb_ref, out_ref, *, k, id_bits):
    """Fused cull + nearest-k selection for one ray tile, entirely in
    VMEM: slab-test every cluster AABB, pack (entry | cluster id) into
    one i32 word per candidate, extract the k nearest by repeated packed
    min. Row k carries the SPILL entry — the (k+1)-th nearest packed
    entry (0x7FFFFFFF if none) — which drives the exact multipass
    restart; row k+1 carries each ray's remaining-overlap count. The
    (R, N_c) entry matrix never exists in HBM — selection was the sparse
    engine's dominant XLA cost.

    Restart progress guarantee: row 8 of the ray block carries the
    ray's previous spill word (INT_MIN on the first pass); candidates
    with a packed word strictly below it are EXCLUDED. Since selection
    within a window is total-ordered by the packed (entry | id) word,
    every candidate below the previous spill was already selected and
    tested by an earlier pass — so a restart always advances past >= k
    fresh candidates even when many clusters share an identical entry
    distance at the window start (overlapping AABBs spanning tlo),
    which would otherwise re-select the same set until max_passes.

    Everything lives TRANSPOSED — rays on the 128-lane minor axis,
    clusters on sublanes — so the ray-feature block is lane-aligned and
    the k min-extractions reduce over the sublane axis instead of
    across lanes. The cluster boxes arrive as a (n_cp, 128) block
    (coords in lanes 0-5): slab broadcasts then read sublane vectors
    natively — the previous (8, n_cp) layout paid a lane->sublane
    transpose of every coordinate row per grid step (the same
    misalignment class the round-2 transposes fixed on the ray side)."""
    rb = F8_ref[0]                                   # (16, tile)
    n_cp = bb_ref.shape[0]
    tile = rb.shape[1]
    prev = jax.lax.bitcast_convert_type(rb[8], jnp.int32)[None, :]
    t0 = jnp.broadcast_to(rb[6][None, :], (n_cp, tile))
    t1 = jnp.broadcast_to(rb[7][None, :], (n_cp, tile))
    for a in range(3):
        tn = (bb_ref[:, a][:, None] - rb[a][None, :]) * rb[3 + a][None, :]
        tf = (bb_ref[:, 3 + a][:, None] - rb[a][None, :]) * rb[3 + a][None, :]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    E = jnp.where(t0 <= t1, jnp.maximum(t0, 0.0), jnp.inf)

    low = (1 << id_bits) - 1
    iota = jax.lax.broadcasted_iota(jnp.int32, (n_cp, tile), 0)
    # Entries are non-negative, so their bits order like the floats; the
    # cluster id rides in the low mantissa (selection-order noise only —
    # every selected pair is still tested against the exact t range).
    Ep = ((jax.lax.bitcast_convert_type(E, jnp.int32) | low) ^ low) | iota
    # Drop candidates already consumed by earlier passes (see docstring).
    Ep = jnp.where(Ep >= prev, Ep, jnp.int32(0x7FFFFFFF))
    cnt = jnp.sum((Ep < _INF_PACK).astype(jnp.int32), axis=0)

    rows = []
    for _ in range(k):
        m = jnp.min(Ep, axis=0)                      # (tile,)
        rows.append(m[None, :])
        Ep = jnp.where(Ep == m[None, :], jnp.int32(0x7FFFFFFF), Ep)
    rows.append(jnp.min(Ep, axis=0)[None, :])        # spill entry
    rows.append(cnt[None, :])
    out_ref[0] = jnp.concatenate(rows, axis=0)       # (k+2, tile)


def _select_nearest_pallas(cs, o, inv_d, tmin, tmax_eff, k, interpret,
                           prev_packed=None):
    """Run the fused select kernel over the wave. Returns
    (lat_valid (k, R) bool, lat_id (k, R) i32 nearest-first,
    spill (R,) i32 packed (k+1)-th nearest entry, cnt (R,) i32 overlap
    count within the [tmin, tmax] window). ``prev_packed`` (R,) i32 is
    the per-ray previous spill word for restart passes (candidates
    strictly below it are excluded — already tested)."""
    R = o[0].shape[0]
    n_c = cs.n_clusters
    n_cp = -(-n_c // 128) * 128
    id_bits = max((n_cp - 1).bit_length(), 1)

    # (n_cp, 128): bbmin lanes 0-2, bbmax lanes 3-5 (lane-aligned block;
    # clusters ride sublanes, see _select_kernel); padding clusters are
    # the degenerate far point 3e37 (always t0 > t1 => culled).
    bb = jnp.full((n_cp, 128), 3e37, jnp.float32)
    bb = bb.at[:n_c, 0:3].set(cs.cl_bbmin)
    bb = bb.at[:n_c, 3:6].set(cs.cl_bbmax)

    # Ray tile sized to keep the (tile, n_cp) entry block in VMEM.
    # Measured dead ends (docs/ROUND3_PLAN.md): the kernel's ~30ms at
    # frame width is neither slab-count- nor step-count-bound — 2048-ray
    # tiles matched 1024 in isolation and ran ~6% slower in-frame, so
    # 1024 stays; the residual needs a Mosaic-level look.
    sel_tile = 1024
    while sel_tile * n_cp * 4 > (4 << 20) or R % sel_tile:
        sel_tile //= 2
        assert sel_tile >= 8, f"wave size {R} has no usable select tile"
    T = R // sel_tile

    # (T, 16, sel_tile): rays ride the lane-aligned minor axis. Row 8 is
    # the previous-spill exclusion word (INT_MIN = nothing excluded);
    # rows 9-15 pad the sublane dim to a whole (8, 128) tile.
    if prev_packed is None:
        prev_packed = jnp.full((R,), -0x80000000, jnp.int32)
    prev_f = jax.lax.bitcast_convert_type(prev_packed, jnp.float32)
    zero = jnp.zeros((R,), jnp.float32)
    F8 = jnp.stack([o[0], o[1], o[2], inv_d[0], inv_d[1], inv_d[2],
                    tmin, tmax_eff, prev_f, zero, zero, zero, zero, zero,
                    zero, zero], axis=0).reshape(16, T, sel_tile)
    F8 = F8.transpose(1, 0, 2)

    # Dead-tile skip: the slab+extract body is the sparse engine's
    # biggest VPU cost and is paid per TILE regardless of its live
    # count. Dead lanes cluster spatially (sky blocks, shrunk-pool
    # tails), so whole dead tiles are common — the grid runs over a
    # live-tile id list (scalar-prefetched) at the smallest capacity
    # bucket covering the live-tile count; dead tiles' output blocks are
    # never written and get masked below.
    tile_live = jnp.any((tmax_eff > 0).reshape(T, sel_tile), axis=1)
    n_lt = jnp.sum(tile_live.astype(jnp.int32))
    tl_ids = jax.lax.sort(
        jnp.where(tile_live, jnp.arange(T, dtype=jnp.int32),
                  jnp.int32(0x7FFFFFFF)))
    # Pad steps re-run the FIRST live tile (id repeat => idempotent
    # rewrite of the same output block). tl_ids[0] is the smallest live
    # id; if no tile is live the grid still needs a valid block id, so
    # fall back to T-1 — its never-written output block is garbage, but
    # every consumer below is masked by lane_live/lat_valid.
    tl_ids = jnp.where(tl_ids == jnp.int32(0x7FFFFFFF),
                       jnp.minimum(tl_ids[0], T - 1), tl_ids)

    kern = partial(_select_kernel, k=k, id_bits=id_bits)

    def make_call(steps):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 16, sel_tile), lambda i, tl: (tl[i], 0, 0)),
                pl.BlockSpec((n_cp, 128), lambda i, tl: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, k + 2, sel_tile),
                                   lambda i, tl: (tl[i], 0, 0)),
        )

        def call(tl, F8, bb):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((T, k + 2, sel_tile),
                                               jnp.int32),
                grid_spec=grid_spec,
                interpret=interpret,
            )(tl[:steps], F8, bb)

        return call

    buckets = [t for t in (T // 4, T // 2) if t >= 8] + [T]
    branch = sum((n_lt > b).astype(jnp.int32) for b in buckets[:-1])
    out = jax.lax.switch(branch, [make_call(b) for b in buckets],
                         tl_ids, F8, bb)

    lane_live = jnp.repeat(tile_live, sel_tile)          # (R,)
    packed = out[:, :k, :].transpose(1, 0, 2).reshape(k, R)
    spill = jnp.where(lane_live, out[:, k, :].reshape(R),
                      jnp.int32(0x7FFFFFFF))
    cnt = jnp.where(lane_live, out[:, k + 1, :].reshape(R), 0)
    lat_valid = (packed < _INF_PACK) & lane_live[None, :]
    lat_id = packed & ((1 << id_bits) - 1)
    return lat_valid, lat_id, spill, cnt


def _nearest_k(entry, k):
    """(R, N_c) entry matrix -> ((k, R) entries, (k, R) cluster ids),
    nearest first; exhausted ranks get entry _INF / id 0. K rounds of
    masked argmin-extract (measured ~6x cheaper than jax.lax.top_k)."""
    R, n_c = entry.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, n_c), 1)
    vals, ids = [], []
    for _ in range(k):
        j = jnp.argmin(entry, axis=1)
        oh = iota == j[:, None]
        v = jnp.sum(jnp.where(oh, entry, 0.0), axis=1)
        vals.append(v)
        ids.append(j.astype(jnp.int32))
        entry = jnp.where(oh, _INF, entry)
    return jnp.stack(vals), jnp.stack(ids)


def _sparse_pass(cs: ClusterScene, o, d, inv_d, tlo, tmax_p, K, SP,
                 pair_budget, prec, interpret, prev_packed=None,
                 guard_tmax=True):
    """One spill-window pass at static width R = len(tlo).

    Fused cull+select lattice, cluster-sorted pair pipeline dispatched to
    the smallest capacity bucket covering the ACTUAL pair count, packed
    per-ray min merge. Returns (best_p (R,) i32 packed, slot_p (R,) i32,
    spill (R,) i32 packed, trunc) — ``spill`` is the (K+1)-th nearest
    entry used by the caller to restart unresolved rays; ``prev_packed``
    excludes candidates below the previous pass's spill word (progress
    guarantee, see _select_kernel)."""
    R = tlo.shape[0]
    C = cs.cluster_size
    n_c = cs.n_clusters
    col_bits = max((C - 1).bit_length(), 1)
    col_mask = (1 << col_bits) - 1
    K = min(K, n_c)

    # Pair-capacity buckets (ascending; never beyond the K*R lattice).
    kr = K * R
    kr_pad = -(-kr // SP) * SP
    cap = min(max(SP, -(-pair_budget * R // SP) * SP), kr_pad)
    # Bucket granularity matters at frame width: the F-row gather and
    # scatter-min run at BUCKET width, so a 1.05M-pair frame paying the
    # 1.5R bucket wasted ~30% of the dominant gather (PERF_NOTES round-3
    # decomposition). Quarter-R steps around the typical 0.6-1.5R range.
    fracs = (((1, 1), (2, 1)) if R <= 131072
             else ((1, 2), (3, 4), (1, 1), (5, 4), (3, 2)))
    cands = set()
    for num, den in fracs:
        m = -(-(R * num // den) // SP) * SP
        if SP <= m < cap:
            cands.add(m)
    pair_buckets = sorted(cands) + [cap]

    G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 2, 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, R), 0)

    # Lattice sort layout: when (cluster, ray, rank) fits one uint32 the
    # sort runs SINGLE-operand (~40% cheaper at frame scale than the
    # 2-operand (keys, payload) form — the sort is the one bounce term
    # that scales with K x POOL width including dead lanes). cl_bits is
    # sized so the all-ones dead marker is above every real cluster id.
    ray_bits = max((R - 1).bit_length(), 1)
    rank_bits = (K - 1).bit_length()
    # Valid lattice ids are < n_c; the all-ones dead marker needs one
    # value above them, so size for n_c (not n_c - 1).
    cl_bits_s = max(int(n_c).bit_length(), 1)
    packed_sort = (cl_bits_s + ray_bits + rank_bits
                   <= PACKED_SORT_MAX_BITS)

    lat_valid, lat_id, spill, _cnt = _select_nearest_pallas(
        cs, o, inv_d, tlo, tmax_p, K, interpret, prev_packed=prev_packed)
    total_pairs = jnp.sum(lat_valid.astype(jnp.int32))

    if packed_sort:
        lo = (jnp.arange(R, dtype=jnp.uint32)[None, :] << rank_bits
              | jnp.arange(K, dtype=jnp.uint32)[:, None])
        word = (lat_id.astype(jnp.uint32) << (ray_bits + rank_bits)) | lo
        word = jnp.where(lat_valid, word, jnp.uint32(0xFFFFFFFF))
        pk_f = jax.lax.sort(word.reshape(-1))
        if kr_pad > kr:
            pk_f = jnp.pad(pk_f, (0, kr_pad - kr),
                           constant_values=jnp.uint32(0xFFFFFFFF))
        ray_mask = jnp.uint32((1 << ray_bits) - 1)
        rank_mask = jnp.uint32((1 << rank_bits) - 1) if rank_bits else None
        cl_f = pk_f   # cluster rides the high bits; pair_branch decodes
        rr_f = pk_f
    else:
        # 2-operand fallback: (keys, ray << 3 | rank) — 2-operand sorts
        # are ~1.5x cheaper than 3-operand at lattice scale
        # (docs/PERF_NOTES.md).
        rayrank = (jnp.broadcast_to(
            jnp.arange(R, dtype=jnp.int32)[None, :] << 3, (K, R))
            | jnp.arange(K, dtype=jnp.int32)[:, None]).reshape(-1)
        keys = jnp.where(lat_valid.reshape(-1), lat_id.reshape(-1),
                         jnp.int32(_DEAD_CLUSTER))
        cl_f, rr_f = jax.lax.sort((keys, rayrank), num_keys=1)
        if kr_pad > kr:
            cl_f = jnp.pad(cl_f, (0, kr_pad - kr),
                           constant_values=_DEAD_CLUSTER)
            rr_f = jnp.pad(rr_f, (0, kr_pad - kr))
    # Narrow per-ray gather source: [d, o, tlo, tmax]. The pair F-row
    # gather is ROW-LATENCY bound (~23ns/row at 16 cols vs ~13 at 8,
    # docs/PERF_NOTES.md facts table), so the bilinear cross-term rows
    # are rebuilt AFTER the gather in XLA — same formulas as
    # _ray_features, bit-identical values, and no Mosaic change (the
    # in-kernel rebuild miscompiled; see the round-3 incident note).
    F8_pass = jnp.stack([d[0], d[1], d[2], o[0], o[1], o[2],
                         tlo, tmax_p], axis=1)

    def pair_branch(mp):
        Bp = mp // SP
        # Items start at run boundaries, of which there are at most mp
        # positions — without the cap, a bucket narrower than n_c (e.g.
        # SP=512's smallest bucket on the 828-cluster battlefield) makes
        # bpos[:max_items] under-slice and the validity where() throws a
        # broadcast error (round-5 sp_tile probe).
        max_items = min(Bp + n_c, mp)
        item_buckets = [b for b in ITEM_BUCKETS if b < max_items]
        item_buckets.append(max_items)
        calls = [_make_call(b, Bp, SP, C, col_bits, prec, interpret,
                            guard_tmax=guard_tmax)
                 for b in item_buckets]

        def br(cl_full, rr_full, F8_pass):
            if packed_sort:
                w = cl_full[:mp]
                cl_s = (w >> (ray_bits + rank_bits)).astype(jnp.int32)
                ray_s = ((w >> rank_bits) & ray_mask).astype(jnp.int32)
                rank_s = ((w & rank_mask).astype(jnp.int32)
                          if rank_bits else jnp.zeros_like(cl_s))
                dead = cl_s >= n_c
            else:
                cl_s = cl_full[:mp]
                ray_s = rr_full[:mp] >> 3
                rank_s = rr_full[:mp] & 7
                dead = cl_s >= _DEAD_CLUSTER
            F8 = jnp.take(F8_pass, ray_s, axis=0)         # (mp, 8)
            dx, dy, dz = F8[:, 0], F8[:, 1], F8[:, 2]
            ox, oy, oz = F8[:, 3], F8[:, 4], F8[:, 5]
            lanes = jnp.where(dead, jnp.int32(_DEAD_CLUSTER),
                              cl_s | (rank_s << _RANK_SHIFT))
            # Rebuild [d, o, d x o, 1 | tlo, tmax, lanes, 0...] — rows
            # 0-9 match scene/clusters.py's G layout exactly
            # (_ray_features formulas); lane words ride col 12 as raw
            # bits (_kernel doc).
            zero = jnp.zeros_like(dx)
            Fp = jnp.stack([
                dx, dy, dz, ox, oy, oz,
                dy * oz - dz * oy, dz * ox - dx * oz, dx * oy - dy * ox,
                jnp.ones_like(dx), F8[:, 6], F8[:, 7],
                jax.lax.bitcast_convert_type(lanes, jnp.float32),
                zero, zero, zero], axis=1)
            Fp = Fp.reshape(Bp, SP, RAY_FEATURES).transpose(0, 2, 1)

            # Work items: one per cluster run per block.
            pos = jnp.arange(mp, dtype=jnp.int32)
            prev = jnp.concatenate([cl_s[:1] - 1, cl_s[:-1]])
            boundary = (~dead & ((pos % SP == 0) | (cl_s != prev)))
            n_items = jnp.sum(boundary.astype(jnp.int32))
            bpos = jax.lax.sort(jnp.where(boundary, pos, jnp.int32(mp)))
            bpos = bpos[:max_items]
            safe = jnp.minimum(bpos, mp - 1)
            # Clamp the cluster id: when n_items == 0 (an all-dead
            # dispatch, e.g. a sky-only ray set) every items entry is
            # built from a DEAD lane, whose packed-sort decode is the
            # all-ones marker (>= n_c) — an unclamped id sends the G
            # BlockSpec out of bounds (block 1023 of 828: hard TPU
            # INTERNAL crash, round-4 bench oracle). The clamped fetch
            # is harmless: no @pl.when(live) body runs for such items,
            # and the first-of-block init writes the miss marker only.
            items = ((safe // SP) << 16) | (
                jnp.minimum(jnp.take(cl_s, safe), n_c - 1) & 0xFFFF)
            last = items[jnp.maximum(n_items - 1, 0)]
            items = jnp.where(jnp.arange(max_items) < n_items, items, last)

            bri = sum((n_items > b).astype(jnp.int32)
                      for b in item_buckets[:-1])
            out = jax.lax.switch(bri, calls, items, n_items, Fp, G3)

            packed = jax.lax.bitcast_convert_type(out[:, 0, :],
                                                  jnp.int32).reshape(mp)
            scatter_ray = jnp.where(~dead, ray_s, R)
            best_p = jnp.full((R,), jnp.int32(_MISS_BITS))
            return best_p.at[scatter_ray].min(packed, mode="drop")
        return br

    pb = sum((total_pairs > b).astype(jnp.int32)
             for b in pair_buckets[:-1])
    best_p = jax.lax.switch(pb, [pair_branch(m) for m in pair_buckets],
                            cl_f, rr_f, F8_pass)

    # Decode this pass's winner slot via its lattice rank.
    rank_w = (best_p >> col_bits) & 7
    col_w = best_p & col_mask
    ksel = iota_k == rank_w[None, :]
    cluster_w = jnp.sum(jnp.where(ksel, lat_id, 0), axis=0)
    slot_p = cluster_w * C + col_w
    trunc = jnp.maximum(total_pairs - pair_buckets[-1], 0)
    return best_p, slot_p, spill, trunc


@partial(jax.jit, static_argnames=("k_pairs", "pair_budget", "sp_tile",
                                   "precision", "interpret", "max_passes",
                                   "k_restart"))
def trace_occlusion_sparse(cs: ClusterScene, rays: Rays,
                           active: jnp.ndarray | None = None,
                           k_pairs: int = 4, pair_budget: int = 3,
                           sp_tile: int = 1024,
                           precision: str = "highest",
                           interpret: bool | None = None,
                           max_passes: int = 4,
                           k_restart: int | None = None):
    """Any-hit occlusion query on the pair-centric sparse engine: True
    where some triangle blocks the ray in [tmin, tmax]. The engine that
    serves scattered rays (bounce-shade shadows) previously had no
    any-hit variant, so those shadows paid the dense tile-union cost
    (reference early-exit semantics apply to every ray class,
    Kernels.h:190-210).

    Reuses the spill-exact multipass pass: a ray is occluded as soon as
    any tested pair hits; rays with no hit among the nearest-K clusters
    and a valid spill restart with the window advanced (no t-shrink —
    occlusion never narrows tmax).

    Returns ``(occluded, under_resolved)``: rays still unresolved at
    ``max_passes`` are reported unoccluded (the bright-leak direction —
    the reference's any-hit is exact, Kernels.h:190-210) and COUNTED,
    together with truncated pairs, in the ``under_resolved`` int32 so
    callers can surface a potential shadow light-leak instead of hiding
    it (VERDICT r3 weak #4)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert 1 <= k_pairs <= 8, "rank rides in 3 packed bits"
    if k_restart is None:
        k_restart = k_pairs
    assert 1 <= k_restart <= 8
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    R = rays.o.shape[0]
    n_c = cs.n_clusters
    K = min(k_pairs, n_c)
    K_r = min(k_restart, n_c)
    SP = sp_tile
    n_cp = -(-n_c // 128) * 128
    id_bits = max((n_cp - 1).bit_length(), 1)
    spill_clear = ~((1 << id_bits) - 1)

    o = tuple(rays.o[:, a] for a in range(3))
    inv3 = safe_inv_dir(rays.d)
    d = tuple(rays.d[:, a] for a in range(3))
    inv_d = tuple(inv3[:, a] for a in range(3))
    tmin = rays.tmin
    tmax0 = rays.tmax if active is None else jnp.where(active, rays.tmax,
                                                       -1.0)

    def decode_spill(s):
        return jax.lax.bitcast_convert_type(s & spill_clear, jnp.float32)

    best, _slot, spill, trunc0 = _sparse_pass(
        cs, o, d, inv_d, tmin, tmax0, K, SP, pair_budget, prec, interpret)
    occluded = best < _MISS_BITS
    unresolved = ((tmax0 > 0) & ~occluded & (spill < _INF_PACK)
                  & (decode_spill(spill) < tmax0))
    tlo = jnp.where(unresolved, decode_spill(spill), tmin)

    # Restart passes on the compacted unresolved set. Shadow queries can
    # leave a larger unresolved tail than closest-hit (no tmax shrink),
    # so the ladder tops out at R/8 (see trace_sparse's ladder note).
    r_pad_o = -(-R // SP) * SP
    width_buckets = sorted({min(r_pad_o, max(SP, (-(-R // dv // SP)) * SP))
                            for dv in (64, 8)})
    iota_r = jnp.arange(R, dtype=jnp.int32)

    def sub_body(st, Rs):
        uidx = jax.lax.sort(
            jnp.where(st["unresolved"], iota_r, jnp.int32(0x7FFFFFFF)))
        uidx = uidx[:Rs] if Rs <= R else jnp.pad(
            uidx, (0, Rs - R), constant_values=0x7FFFFFFF)
        valid = uidx < 0x7FFFFFFF
        idx = jnp.where(valid, uidx, 0)

        o_s = jnp.take(rays.o, idx, axis=0)
        d_s = jnp.take(rays.d, idx, axis=0)
        inv_s = safe_inv_dir(d_s)
        tlo_s = jnp.take(st["tlo"], idx)
        prev_s = jnp.take(st["prev"], idx)
        tmax_s = jnp.where(valid, jnp.take(tmax0, idx), -1.0)

        bp, _sp, spill_s, tr_s = _sparse_pass(
            cs, tuple(o_s[:, a] for a in range(3)),
            tuple(d_s[:, a] for a in range(3)),
            tuple(inv_s[:, a] for a in range(3)),
            tlo_s, tmax_s, K_r, SP, K_r, prec, interpret,
            prev_packed=prev_s)

        occ_s = (bp < _MISS_BITS) | jnp.take(st["occluded"], idx)
        spill_es = decode_spill(spill_s)
        unres_s = (valid & ~occ_s & (spill_s < _INF_PACK)
                   & (spill_es < tmax_s))
        sidx = jnp.where(valid, idx, R)
        return dict(
            occluded=st["occluded"].at[sidx].set(occ_s, mode="drop"),
            tlo=st["tlo"].at[sidx].set(
                jnp.where(unres_s, spill_es, tlo_s), mode="drop"),
            prev=st["prev"].at[sidx].set(spill_s, mode="drop"),
            unresolved=st["unresolved"].at[sidx].set(unres_s, mode="drop"),
            n_pass=st["n_pass"] + 1,
            trunc=st["trunc"] + tr_s,
        )

    def restart_body(st):
        if len(width_buckets) == 1:
            return sub_body(st, width_buckets[0])
        n_un = jnp.sum(st["unresolved"].astype(jnp.int32))
        br = sum((n_un > b).astype(jnp.int32) for b in width_buckets[:-1])
        return jax.lax.switch(
            br, [partial(sub_body, Rs=w) for w in width_buckets], st)

    out = jax.lax.while_loop(
        lambda st: jnp.any(st["unresolved"]) & (st["n_pass"] < max_passes),
        restart_body,
        dict(occluded=occluded, tlo=tlo, prev=spill, unresolved=unresolved,
             n_pass=jnp.int32(1), trunc=trunc0))
    under_resolved = (jnp.sum(out["unresolved"].astype(jnp.int32))
                      + out["trunc"])
    return out["occluded"], under_resolved


@partial(jax.jit, static_argnames=("k_pairs", "pair_budget", "sp_tile",
                                   "precision", "interpret", "max_passes",
                                   "k_first", "k_restart"))
def trace_sparse(cs: ClusterScene, rays: Rays,
                 env: Environment | None = None,
                 active: jnp.ndarray | None = None,
                 k_pairs: int = 4,
                 pair_budget: int = 3,
                 sp_tile: int = 1024,
                 precision: str = "highest",
                 interpret: bool | None = None,
                 max_passes: int = 4,
                 k_first: int | None = None,
                 k_restart: int | None = None):
    """Pair-centric trace, spill-exact multipass. Returns (MxuHits,
    overflow).

    ``k_pairs`` nearest clusters are tested per ray per PASS; rays whose
    overlap window spills past the K-th cluster (the select kernel
    reports the (K+1)-th entry) restart with the window advanced to the
    spill distance and their t range shrunk to the current best hit — the
    batched analog of ordered traversal resuming from a short stack
    (reference Kernels.h:169-211), so heavy-overlap rays are handled
    EXACTLY instead of dropping clusters (per-ray overlap on
    battlefield-class scenes: mean 2.1, p99 = 12 — docs/PERF_NOTES.md).

    ``k_first`` (default: = k_pairs) is the RANK-PHASED knob: pass 1
    tests only the ``k_first`` nearest clusters — front-to-back, the
    nearest cluster usually contains the winning hit, so k_first=1 cuts
    the pass-1 pair volume (sort + F-gather + kernel + merge all scale
    with pairs) roughly in half and leaves the minority of unresolved
    rays to the compacted restart passes, which test ``k_pairs`` more
    clusters each with the spill-word exclusion guaranteeing progress.

    ``k_restart`` (default: = k_pairs) is the RESTART-WIDTH knob: each
    restart pass tests this many clusters beyond the spill window.
    Restart passes run at small compacted widths where each pallas
    dispatch has a ~2 ms FIXED cost regardless of item count
    (tools/probe_call_floor.py) — the whitted depth-8 frame paid ~35
    restart pair-kernel calls = ~66 ms for trivial work. A wider
    restart resolves long-tail rays in fewer passes, trading a few
    extra (cheap) pairs for whole dispatches.

    Pass 1 runs at full width; restart passes run on the COMPACTED
    unresolved set at the smallest width bucket (R/16 or R/4) covering
    it (a full-width restart measured ~88ms at frame scale for <1k
    unresolved rays). Passes cap at ``max_passes``; rays still
    unresolved then are counted in ``overflow``.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert 1 <= k_pairs <= 8, "rank rides in 3 packed bits"
    if k_first is None:
        k_first = k_pairs
    assert 1 <= k_first <= 8
    if k_restart is None:
        k_restart = k_pairs
    assert 1 <= k_restart <= 8
    # Mosaic supports HIGHEST (fp32) and DEFAULT (one-pass bf16) only.
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    R = rays.o.shape[0]
    C = cs.cluster_size
    n_c = cs.n_clusters
    col_bits = max((C - 1).bit_length(), 1)
    low_mask = (1 << (col_bits + 3)) - 1
    K = min(k_pairs, n_c)
    K_r = min(k_restart, n_c)
    SP = sp_tile

    n_cp = -(-n_c // 128) * 128
    id_bits = max((n_cp - 1).bit_length(), 1)
    spill_clear = ~((1 << id_bits) - 1)

    o = tuple(rays.o[:, a] for a in range(3))
    inv3 = safe_inv_dir(rays.d)
    d = tuple(rays.d[:, a] for a in range(3))
    inv_d = tuple(inv3[:, a] for a in range(3))
    tmin = rays.tmin
    tmax0 = rays.tmax if active is None else jnp.where(active, rays.tmax,
                                                       -1.0)

    def decode_t(b):
        """Packed best -> conservative UPPER bound of the winner's true t.

        The packed score is t * rcp_approx(ad) (|rel err| < 2^-12) with
        the low col_bits+3 bits cleared (-2^-13): decode can land up to
        ~2^-12 BELOW the true t, and the multipass logic needs a bound
        that never does (a spill window top below the true t would skip
        a restart that could find a closer hit, or cull its cluster).
        The 2^-11 inflation restores the one-sided invariant the exact
        division gave; the only cost is restarts in a 2^-11-wide t band
        that find nothing."""
        t_lo = jax.lax.bitcast_convert_type(b & ~low_mask, jnp.float32)
        return t_lo * jnp.float32(1.0 + 2.0 ** -11)

    def decode_spill(s):
        return jax.lax.bitcast_convert_type(s & spill_clear, jnp.float32)

    # ---- pass 1: full width, k_first nearest ----
    K1 = min(k_first, n_c)
    best, slot, spill, trunc = _sparse_pass(
        cs, o, d, inv_d, tmin, tmax0, K1, SP, pair_budget, prec, interpret,
        guard_tmax=False)
    spill_e = decode_spill(spill)
    unresolved = ((tmax0 > 0) & (spill < _INF_PACK)
                  & (spill_e < jnp.minimum(decode_t(best), tmax0)))
    tlo = jnp.where(unresolved, spill_e, tmin)

    # ---- restart passes: compacted unresolved set, width-bucketed ----
    # The tail is LONG-tailed: a handful of heavy-overlap rays keep the
    # while_loop alive to max_passes, and every iteration used to run at
    # a fixed R/16 bucket (~7ms each at frame width — the largest single
    # bounce term on the round-3 xplane profile, ~22ms/dispatch). The
    # ladder lets late passes run at tail-sized widths; with rank-phasing
    # (k_first < k_pairs) pass 2 carries a sizable fraction, so an R/4
    # bucket is added.
    r_pad = -(-R // SP) * SP
    width_buckets = sorted({min(r_pad, max(SP, (-(-R // dv // SP)) * SP))
                            for dv in ((64, 16, 4) if k_first < k_pairs
                                       else (64, 16))})
    iota_r = jnp.arange(R, dtype=jnp.int32)

    def sub_body(st, Rs):
        uidx = jax.lax.sort(
            jnp.where(st["unresolved"], iota_r, jnp.int32(0x7FFFFFFF)))
        uidx = uidx[:Rs] if Rs <= R else jnp.pad(
            uidx, (0, Rs - R), constant_values=0x7FFFFFFF)
        valid = uidx < 0x7FFFFFFF
        idx = jnp.where(valid, uidx, 0)

        o_s = jnp.take(rays.o, idx, axis=0)
        d_s = jnp.take(rays.d, idx, axis=0)
        inv_s = safe_inv_dir(d_s)
        tlo_s = jnp.take(st["tlo"], idx)
        prev_s = jnp.take(st["prev"], idx)
        best_s = jnp.take(st["best"], idx)
        slot_s = jnp.take(st["slot"], idx)
        tmax_r = jnp.take(tmax0, idx)
        tmax_s = jnp.where(valid,
                           jnp.minimum(decode_t(best_s), tmax_r), -1.0)

        bp, sp_p, spill_s, trunc_s = _sparse_pass(
            cs, tuple(o_s[:, a] for a in range(3)),
            tuple(d_s[:, a] for a in range(3)),
            tuple(inv_s[:, a] for a in range(3)),
            tlo_s, tmax_s, K_r, SP, K_r, prec, interpret,
            prev_packed=prev_s, guard_tmax=False)

        better = bp < best_s
        merged = jnp.minimum(bp, best_s)
        slot_m = jnp.where(better, sp_p, slot_s)
        spill_es = decode_spill(spill_s)
        unres_s = (valid & (spill_s < _INF_PACK)
                   & (spill_es < jnp.minimum(decode_t(merged), tmax_r)))
        tlo_m = jnp.where(unres_s, spill_es, tlo_s)

        sidx = jnp.where(valid, idx, R)
        return dict(
            best=st["best"].at[sidx].set(merged, mode="drop"),
            slot=st["slot"].at[sidx].set(slot_m, mode="drop"),
            tlo=st["tlo"].at[sidx].set(tlo_m, mode="drop"),
            prev=st["prev"].at[sidx].set(spill_s, mode="drop"),
            unresolved=st["unresolved"].at[sidx].set(unres_s, mode="drop"),
            n_pass=st["n_pass"] + 1,
            overflow=st["overflow"] + trunc_s,
        )

    def restart_body(st):
        if len(width_buckets) == 1:
            return sub_body(st, width_buckets[0])
        n_un = jnp.sum(st["unresolved"].astype(jnp.int32))
        br = sum((n_un > b).astype(jnp.int32) for b in width_buckets[:-1])
        return jax.lax.switch(
            br, [partial(sub_body, Rs=w) for w in width_buckets], st)

    out = jax.lax.while_loop(
        lambda st: jnp.any(st["unresolved"]) & (st["n_pass"] < max_passes),
        restart_body,
        dict(best=best, slot=slot, tlo=tlo, prev=spill,
             unresolved=unresolved, n_pass=jnp.int32(1), overflow=trunc))

    best = out["best"]
    hit = best < _MISS_BITS
    slot = jnp.where(hit, out["slot"], 0)
    overflow = out["overflow"] + jnp.sum(out["unresolved"].astype(jnp.int32))

    # One fused row gather: id + geometry + shading attrs (clusters.py).
    # Cost is rows x (10 + 1.4 x cols) ns — the earlier "column-free"
    # reading came from a probe whose consumer used only [:, 0], letting
    # XLA narrow the gather to ONE column (round-4 session-3 finding);
    # an optimization_barrier on ``slot`` was probed and changed nothing.
    attr = jnp.take(cs.attrs, slot, axis=0)
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

    # The kernel runs without the tmax guard (guard_tmax=False above):
    # re-enforce the window EXACTLY here on the refined t. The packed
    # min picked the NEAREST valid hit, so "nearest > tmax" implies no
    # in-window hit exists — the post-filter is exact, not approximate.
    hit = hit & (t < rays.tmax)

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
