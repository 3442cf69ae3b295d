"""Multi-block pair kernel probe (round-4 lever #1, VERDICT r3 #2).

The production pair kernel runs ONE (block, cluster) item per grid step:
~1.9k items x ~5us step tax at frame width = ~10ms/bounce of pure
pipeline overhead for ~0.5us of matmul each (docs/PERF_NOTES.md xplane).
This probe tests a MULTI-BLOCK kernel: each grid step owns GB pair
blocks and loops their cluster runs with double-buffered manual DMA of
the G blocks (probe_dma.py validated dynamic DMA on this link). Steps
drop ~8x; the G fetch leaves the BlockSpec pipeline and rides explicit
async copies.

MISCOMPILE GUARD: round 3 found Mosaic silently miscompiles matmul
operands ASSEMBLED FROM COMPUTED ROWS (register concat or scratch row
writes). Here the matmul operand is a whole DMA-written scratch buffer —
a different class — but the probe still asserts bitwise equality with
the production kernel on a REAL frame-width bounce pool before any
timing is trusted.

Run from repo root: timeout 1800 python tools/probe_pair_dma.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.ops.trace_sparse import (_DEAD_CLUSTER, _MISS_BITS,
                                           _MISS_F32, _RANK_SHIFT, _SIGN,
                                           OUT_COLS, _make_call,
                                           _select_nearest_pallas)
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.scene.clusters import RAY_FEATURES, compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

GB = 4          # pair blocks per grid step
SP = 1024
K = 4


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


# ---------------------------------------------------------------------------
# Multi-block kernel: grid step i owns F blocks [GB*i, GB*i+GB); the
# per-block cluster runs come from scalar-prefetched run offsets.
# ---------------------------------------------------------------------------

def _kernel_mb(starts_ref, clusters_ref, F_ref, G_any, out_ref,
               g_scr, sem, *, col_bits, precision, C):
    i = pl.program_id(0)
    sp = F_ref.shape[2]

    def block_body(bb, _):
        b = i * GB + bb
        Fm = F_ref[bb]                                   # (16, sp)
        lanes = jax.lax.bitcast_convert_type(Fm[12], jnp.int32)
        rank = jax.lax.shift_right_logical(lanes, _RANK_SHIFT)
        cl_of_lane = lanes & ((1 << _RANK_SHIFT) - 1)
        tmin = Fm[10][None, :]
        tmax = Fm[11][None, :]
        lo = starts_ref[b]
        hi = starts_ref[b + 1]

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (C, sp), 0)
        low = (1 << (col_bits + 3)) - 1

        # Double-buffered G DMA over the block's cluster runs.
        def start_fetch(j, slot):
            c = clusters_ref[jnp.minimum(j, hi - 1)]
            return pltpu.make_async_copy(G_any.at[c], g_scr.at[slot],
                                         sem.at[slot])

        first = start_fetch(lo, 0)

        @pl.when(lo < hi)
        def _():
            first.start()

        def run_body(j, acc):
            slot = (j - lo) % 2
            nxt = start_fetch(j + 1, 1 - slot)

            @pl.when(j + 1 < hi)
            def _():
                nxt.start()

            start_fetch(j, slot).wait()
            # G arrives TRANSPOSED (16, 4C): a (.., 4C, 16) DMA block is
            # rejected (minor dim must be 128-aligned), so the HBM layout
            # keeps 4C on lanes and the matmul contracts lhs dim 0.
            G = g_scr[slot]                              # (16, 4C)
            cluster = clusters_ref[j]
            mask = cl_of_lane == cluster

            S = jax.lax.dot_general(G, Fm, (((0,), (0,)), ((), ())),
                                    precision=precision)  # (4C, sp)
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
            valid = (sign_ok & (jnp.abs(u_n) + jnp.abs(v_n) <= ad)
                     & (ts > ad * tmin) & (ts < ad * tmax))
            score = jnp.where(valid, ts / jnp.maximum(ad, 1e-37), 3e38)
            sp_bits = (((jax.lax.bitcast_convert_type(score, jnp.int32)
                         | low) ^ low)
                       | (rank[None, :] << col_bits) | col_ids)
            m = jnp.min(sp_bits, axis=0)
            return jnp.where(mask, jnp.minimum(m, acc), acc)

        acc = jax.lax.fori_loop(
            lo, hi, run_body,
            jnp.full((sp,), jnp.int32(_MISS_BITS)))
        out_ref[bb] = jnp.concatenate(
            [jax.lax.bitcast_convert_type(acc, jnp.float32)[None, :],
             jnp.full((OUT_COLS - 1, sp), _MISS_F32, jnp.float32)],
            axis=0)
        return 0

    jax.lax.fori_loop(0, GB, block_body, 0)


def make_mb_call(Bp, C, col_bits, precision):
    kern = partial(_kernel_mb, col_bits=col_bits, precision=precision, C=C)
    n_steps = Bp // GB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((GB, RAY_FEATURES, SP),
                         lambda i, starts, cls: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((GB, OUT_COLS, SP),
                               lambda i, starts, cls: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((2, RAY_FEATURES, 4 * C), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )

    def call(starts, clusters, Fp, G3):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Bp, OUT_COLS, SP), jnp.float32),
            grid_spec=grid_spec,
        )(starts, clusters, Fp, G3)

    return call


# ---------------------------------------------------------------------------
# Shared plumbing: a REAL frame-width bounce pool -> sorted pair arrays.
# ---------------------------------------------------------------------------

print("building real bounce pool...", flush=True)
sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
env = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                         sd.env_pixels.shape[0])
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
N = 983040
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)
x = jnp.asarray(xs, jnp.int32)
y = jnp.asarray(ys, jnp.int32)
alive0 = jnp.asarray(perm >= 0)
key = jax.random.PRNGKey(3)


@jax.jit
def bounce_pool(x, y, alive0, key):
    rays = generate_pixel_rays(cam, x, y, key=key)
    hits, surf, _ = _trace_and_surface(cs, rays, alive0, "pallas", 1024, 48)
    zero3 = jnp.zeros((N, 3), jnp.float32)
    ones3 = jnp.ones((N, 3), jnp.float32)
    r2, w2, d2, a2, _, _ = _shade_advance(
        hits, surf, rays, ones3, jnp.zeros((N,), jnp.int32), alive0,
        rays.d, zero3, jax.random.fold_in(key, 1), 2)
    return r2, a2


rays_b, alive_b = bounce_pool(x, y, alive0, key)
print("live:", int(alive_b.sum()), flush=True)

o = tuple(rays_b.o[:, a] for a in range(3))
d = tuple(rays_b.d[:, a] for a in range(3))
inv3 = safe_inv_dir(rays_b.d)
inv_d = tuple(inv3[:, a] for a in range(3))
tmin = rays_b.tmin
tmax0 = jnp.where(alive_b, rays_b.tmax, -1.0)

C = cs.cluster_size
n_c = cs.n_clusters
col_bits = max((C - 1).bit_length(), 1)


@jax.jit
def build_pairs():
    """Replicates _sparse_pass's pair plumbing (sorted cluster-major
    pair arrays + rebuilt F rows) at a FIXED capacity so both kernels
    see identical inputs."""
    lat_valid, lat_id, spill, _ = _select_nearest_pallas(
        cs, o, inv_d, tmin, tmax0, K, False)
    R = N
    kr = K * R
    rayrank = (jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[None, :] << 3, (K, R))
        | jnp.arange(K, dtype=jnp.int32)[:, None]).reshape(-1)
    keys = jnp.where(lat_valid.reshape(-1), lat_id.reshape(-1),
                     jnp.int32(_DEAD_CLUSTER))
    cl_f, rr_f = jax.lax.sort((keys, rayrank), num_keys=1)
    mp = -(-(R * 3 // 2) // SP) * SP           # 1.5R capacity bucket
    cl_s = cl_f[:mp]
    ray_s = rr_f[:mp] >> 3
    rank_s = rr_f[:mp] & 7
    F8 = jnp.stack([d[0], d[1], d[2], o[0], o[1], o[2], tmin, tmax0],
                   axis=1)
    F8 = jnp.take(F8, ray_s, axis=0)
    dx, dy, dz = F8[:, 0], F8[:, 1], F8[:, 2]
    ox, oy, oz = F8[:, 3], F8[:, 4], F8[:, 5]
    lanes = jnp.where(cl_s >= _DEAD_CLUSTER, jnp.int32(_DEAD_CLUSTER),
                      cl_s | (rank_s << _RANK_SHIFT))
    zero = jnp.zeros_like(dx)
    Fp = jnp.stack([
        dx, dy, dz, ox, oy, oz,
        dy * oz - dz * oy, dz * ox - dx * oz, dx * oy - dy * ox,
        jnp.ones_like(dx), F8[:, 6], F8[:, 7],
        jax.lax.bitcast_convert_type(lanes, jnp.float32),
        zero, zero, zero], axis=1)
    Fp = Fp.reshape(mp // SP, SP, RAY_FEATURES).transpose(0, 2, 1)

    pos = jnp.arange(mp, dtype=jnp.int32)
    prev = jnp.concatenate([cl_s[:1] - 1, cl_s[:-1]])
    boundary = ((cl_s < _DEAD_CLUSTER)
                & ((pos % SP == 0) | (cl_s != prev)))
    n_items = jnp.sum(boundary.astype(jnp.int32))
    Bp = mp // SP
    max_items = Bp + n_c
    bpos = jax.lax.sort(jnp.where(boundary, pos, jnp.int32(mp)))
    bpos = bpos[:max_items]
    safe = jnp.minimum(bpos, mp - 1)
    items = ((safe // SP) << 16) | (jnp.take(cl_s, safe) & 0xFFFF)
    last = items[jnp.maximum(n_items - 1, 0)]
    items = jnp.where(jnp.arange(max_items) < n_items, items, last)

    # Multi-block inputs: per-block [start, end) into a dense cluster
    # list. Runs are already block-major in `items`.
    item_block = jnp.where(jnp.arange(max_items) < n_items,
                           items >> 16, Bp)
    starts = jnp.searchsorted(item_block, jnp.arange(Bp + 1),
                              method="scan_unrolled").astype(jnp.int32)
    clusters = (items & 0xFFFF).astype(jnp.int32)
    return items, n_items, Fp, starts, clusters, cl_s, ray_s


items, n_items, Fp, starts, clusters, cl_s, ray_s = jax.block_until_ready(
    build_pairs())
mp = cl_s.shape[0]
Bp = mp // SP
print("pairs capacity:", mp, "blocks:", Bp, "items:", int(n_items),
      flush=True)

G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 2, 0)
# DMA-source layout: (n_c, 16, 4C) — minor dim 4C is 128-aligned (a
# (.., 4C, 16) block slice is rejected by Mosaic's tiling rules).
G3t = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 0, 2)
prec = jax.lax.Precision.HIGHEST

# ---- production kernel (exact item-count grid for apples-to-apples) ----
base_call = jax.jit(_make_call(int(n_items), Bp, SP, C, col_bits, prec,
                               False))
out_base = jax.block_until_ready(
    base_call(items, n_items, Fp, G3))

# ---- multi-block kernel ----
mb_call = jax.jit(make_mb_call(Bp, C, col_bits, prec))
print("compiling multi-block kernel...", flush=True)
out_mb = jax.block_until_ready(mb_call(starts, clusters, Fp, G3t))

b0 = np.asarray(out_base[:, 0, :])
m0 = np.asarray(out_mb[:, 0, :])
# Compare only LIVE pairs: the production consumer scatter-mins rows
# with cl_s < _DEAD_CLUSTER and drops the rest (trace_sparse.py
# pair_branch), and the base kernel leaves dead-tail blocks' output
# uninitialized (no item ever targets them) — raw full-buffer equality
# would compare garbage.
live_mask = np.asarray(cl_s < _DEAD_CLUSTER).reshape(Bp, SP)
n_diff = int(((b0 != m0) & live_mask).sum())
emit(stage="mb_exactness", n_diff=n_diff, n=int(live_mask.sum()))
assert n_diff == 0, "HARDWARE MISCOMPILE or logic bug — do not trust timings"

# ---- timing: chained, varied inputs (relay dedup) ----
def time_base(eps, z):
    it = items + (eps * 0).astype(jnp.int32)
    return base_call(it, n_items, Fp, G3)[:, 0, :1] + eps


def time_mb(eps, z):
    st = starts + (eps * 0).astype(jnp.int32)
    return mb_call(st, clusters, Fp, G3t)[:, 0, :1] + eps


ms_b = _timed_loop(time_base, (jnp.float32(0),), 8) * 1e3
ms_m = _timed_loop(time_mb, (jnp.float32(0),), 8) * 1e3
emit(stage="pair_kernel_frame_width", base_ms=ms_b, mb_ms=ms_m,
     items=int(n_items), blocks=Bp, gb=GB)
print("DONE", flush=True)
