"""Union probe for the fused sorted-ray bounce kernel (round 3).

Design under test (docs/ROUND3_PLAN.md "fused select->pair"): sort the
LIVE bounce rays by their nearest selected cluster, then run ONE Pallas
kernel over ray tiles whose F block stays resident in VMEM while the
kernel loops over the tile's distinct candidate clusters (G blocks
fetched by computed index), accumulating the per-lane packed min in
registers. No pair arrays, no per-pair F gather, no scatter-min.

Its cost scales with sum_t U_t (per-tile union of the K-lattice over the
tile's lanes): MXU work = sum U_t * sp * C tests and VPU decode = the
same * ops/candidate, vs the pair pipeline's pairs * C. This probe
measures U_t distributions on a REAL bounce pool for tile widths and
sort keys, and prints the implied visit counts + waste factors.

Run from repo root on the TPU: python tools/probe_union.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_sparse import _select_nearest_pallas
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)

W, H = sd.viewport_width, sd.viewport_height
N = 983040
WAVE = 65536
K = 4
perm, xs, ys = block_swizzle(W, H, N)


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


@jax.jit
def make_bounce_wave(x, y, alive0, k):
    rays = generate_pixel_rays(cam, x, y, key=k)
    hits, surf, _ = _trace_and_surface(cs, rays, alive0, "pallas", 1024, 48)
    r2, w2, d2, a2, md, mw = _shade_advance(
        hits, surf, rays, jnp.ones((WAVE, 3)), jnp.zeros((WAVE,), jnp.int32),
        alive0, rays.d, jnp.zeros((WAVE, 3)), jax.random.fold_in(k, 1), 2)
    return r2, a2


os_, ds_, al_ = [], [], []
for w in range(N // WAVE):
    sl = slice(w * WAVE, (w + 1) * WAVE)
    r2, a2 = make_bounce_wave(jnp.asarray(xs[sl], jnp.int32),
                              jnp.asarray(ys[sl], jnp.int32),
                              jnp.asarray(perm[sl] >= 0),
                              jax.random.fold_in(key, w))
    os_.append(r2.o); ds_.append(r2.d); al_.append(a2)

o = jnp.concatenate(os_); d = jnp.concatenate(ds_)
alive = jnp.concatenate(al_)
n_live = int(jnp.sum(alive))
emit(stage="bounce_pool", n=N, live=n_live)

oc = tuple(o[:, a] for a in range(3))
inv3 = safe_inv_dir(d)
invc = tuple(inv3[:, a] for a in range(3))
tmin = jnp.full((N,), 1e-4, jnp.float32)
tmax_eff = jnp.where(alive, jnp.float32(1e6), jnp.float32(-1.0))

lv, lid, spill, cnt = jax.jit(
    lambda: _select_nearest_pallas(cs, oc, invc, tmin, tmax_eff, K, False))()
lv = np.asarray(lv)          # (K, N) bool, nearest-first
lid = np.asarray(lid)        # (K, N) i32
alive_np = np.asarray(alive)

live = alive_np & lv[0]      # rays with >= 1 candidate
idx = np.nonzero(live)[0]
total_pairs = int(lv[:, idx].sum())
emit(stage="lattice", live_with_cand=int(idx.size), total_pairs=total_pairs,
     pairs_per_ray=round(total_pairs / max(idx.size, 1), 3))

DEAD = 1 << 16
lid_m = np.where(lv, lid, DEAD)   # masked lattice


def union_stats(order, sp):
    """Per-tile distinct-cluster count over K ranks for live rays in
    ``order``, padded to a multiple of sp (pad lanes contribute none)."""
    n = order.size
    T = -(-n // sp)
    pad = T * sp - n
    lm = lid_m[:, order]                        # (K, n)
    if pad:
        lm = np.concatenate([lm, np.full((K, pad), DEAD, np.int32)], axis=1)
    lm = lm.reshape(K, T, sp)
    unions = np.empty(T, np.int32)
    for t in range(T):
        u = np.unique(lm[:, t, :])
        unions[t] = u.size - (1 if DEAD in u else 0)
    return unions


for tag, order in (
    ("frame_order", idx),
    ("sort_c0", idx[np.argsort(lid_m[0, idx], kind="stable")]),
    ("sort_c0c1", idx[np.lexsort((lid_m[1, idx], lid_m[0, idx]))]),
):
    for sp in (256, 512, 1024):
        u = union_stats(order, sp)
        visits = int(u.sum())
        emit(stage="union", order=tag, sp=sp, tiles=int(u.size),
             mean=round(float(u.mean()), 2), p50=int(np.percentile(u, 50)),
             p90=int(np.percentile(u, 90)), max=int(u.max()),
             visits=visits,
             # candidate-slots touched / real pairs (MXU+decode waste)
             waste=round(visits * sp / max(total_pairs, 1), 2))

# Per-ray rank histogram (how many candidates each live ray has)
pc = lv[:, idx].sum(axis=0)
emit(stage="rank_hist", **{f"k{i}": int((pc == i).sum()) for i in range(K + 1)})
