"""Rank-phased sparse probe: is testing the nearest cluster FIRST and
restarting only unresolved rays cheaper than testing nearest-K at once?

Round-2 ceiling model (docs/PERF_NOTES.md): the bounce trace's HBM terms
(pair F-gather ~23ms, lattice sort ~10ms, scatter-min ~7ms) scale with
TOTAL PAIRS (~2.07/live ray at k=4). Front-to-back, most rays' nearest
cluster already contains the winning hit, so a k=1 pass should resolve a
large fraction while halving pair volume; the spill-exact multipass
machinery already handles the rest. This measures, on REAL bounce rays:

  1. trace_sparse k4 (production baseline)
  2. trace_sparse k1/k2 with max_passes=1 -> time + unresolved fraction
  3. trace_sparse k1 with full multipass (restart width R/16)
  4. select kernel alone at K=1 vs K=4 (16-row layout, this round)
  5. dense pallas primary baseline (decode-work reference)

Run from repo root on the TPU: python tools/profile_rank_phase.py
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
from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
from rayaccel_tpu.ops.trace_sparse import trace_sparse, _select_nearest_pallas
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)

W, H = sd.viewport_width, sd.viewport_height
N = 983040
WAVE = 65536
perm, xs, ys = block_swizzle(W, H, N)


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


# ---- real bounce rays (trace+shade battlefield primaries) ----
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

rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))


def t_sparse(tag, iters=4, **kw):
    def f(eps, o, d, tmin, tmax, act):
        rr = Rays(o, d, tmin + eps, tmax)
        res, ov = trace_sparse(cs, rr, active=act, **kw)
        return res.hits.t
    ms = _timed_loop(f, (rays.o, rays.d, rays.tmin, rays.tmax, alive),
                     iters) * 1e3
    _, ov = trace_sparse(cs, rays, active=alive, **kw)
    emit(stage=tag, ms=round(ms, 3), overflow=int(ov),
         unresolved_frac=round(int(ov) / max(n_live, 1), 4),
         **{k: v for k, v in kw.items()})


# 1. production baseline
t_sparse("sparse_k4_full", k_pairs=4, max_passes=4)
# 2. single-pass economy: how much resolves with the nearest 1/2?
t_sparse("sparse_k1_p1", k_pairs=1, max_passes=1)
t_sparse("sparse_k2_p1", k_pairs=2, max_passes=1)
# 3. k1 exact via existing multipass (restart width R/16)
t_sparse("sparse_k1_full", k_pairs=1, max_passes=6)
t_sparse("sparse_k2_full", k_pairs=2, max_passes=6)

# 4. select kernel alone at K=1 vs K=4 (post 16-row-layout change)
oc = tuple(o[:, a] for a in range(3))
inv3 = safe_inv_dir(d)
invc = tuple(inv3[:, a] for a in range(3))
tmin = rays.tmin
tmax_eff = jnp.where(alive, rays.tmax, -1.0)

for K in (1, 4):
    @jax.jit
    def sel(eps, tmin):
        lv, lid, spill, cnt = _select_nearest_pallas(
            cs, oc, invc, tmin + eps, tmax_eff, K, False)
        return lid.astype(jnp.float32) + lv
    ms = _timed_loop(lambda eps, tm: sel(eps, tm), (tmin,), 6) * 1e3
    emit(stage="select_only", K=K, ms=round(ms, 3))

# 5. dense primary baseline (unchanged kernel, sanity reference)
x0 = jnp.asarray(xs[:WAVE], jnp.int32)
y0 = jnp.asarray(ys[:WAVE], jnp.int32)
a0 = jnp.asarray(perm[:WAVE] >= 0)
prays = generate_pixel_rays(cam, x0, y0, key=key)


def f_dense(eps, o, d, tmin, tmax, act):
    rr = Rays(o, d, tmin + eps, tmax)
    res, _ = trace_mxu_pallas(cs, rr, active=act, tile=1024)
    return res.hits.t


ms = _timed_loop(f_dense, (prays.o, prays.d, prays.tmin, prays.tmax, a0),
                 8) * 1e3
emit(stage="dense_primary_65k", ms=round(ms, 3))
