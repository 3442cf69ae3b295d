"""Real-bounce-ray study: overlap distribution + true sparse costs.

Builds REAL bounce rays by tracing+shading battlefield primaries, then
measures (a) the per-ray cluster-overlap histogram that sets k_pairs /
pair_budget, (b) trace_sparse cost and drop counts at frame-scale sizes,
(c) the regroup (sort+gather) branch at frame size.
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
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.regroup import coherence_key
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)

W, H = sd.viewport_width, sd.viewport_height
perm, xs, ys = block_swizzle(W, H, 983040)
N = 983040
WAVE = 65536


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


# ---- build real bounce rays for the whole frame (device) ----
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
    x = jnp.asarray(xs[sl], jnp.int32)
    y = jnp.asarray(ys[sl], jnp.int32)
    a0 = jnp.asarray(perm[sl] >= 0)
    r2, a2 = make_bounce_wave(x, y, a0, jax.random.fold_in(key, w))
    os_.append(r2.o); ds_.append(r2.d); al_.append(a2)

o = jnp.concatenate(os_); d = jnp.concatenate(ds_)
alive = jnp.concatenate(al_)
n_live = int(jnp.sum(alive))
emit(stage="bounce_pop", n=N, live=n_live)

# ---- overlap histogram for LIVE bounce rays ----
@jax.jit
def overlap_counts(o, d, alive):
    inv3 = safe_inv_dir(d)
    t0 = jnp.full((o.shape[0], cs.n_clusters), 1e-3)
    t1 = jnp.where(alive, 1e6, -1.0)[:, None] * jnp.ones((1, cs.n_clusters))
    for a in range(3):
        tn = (cs.cl_bbmin[:, a][None, :] - o[:, a][:, None]) * inv3[:, a][:, None]
        tf = (cs.cl_bbmax[:, a][None, :] - o[:, a][:, None]) * inv3[:, a][:, None]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    return jnp.sum(t0 <= t1, axis=1)


cnt_all = []
for w in range(N // WAVE):
    sl = slice(w * WAVE, (w + 1) * WAVE)
    cnt_all.append(np.asarray(overlap_counts(o[sl], d[sl], alive[sl])))
cnt = np.concatenate(cnt_all)[np.asarray(alive)]
emit(stage="overlap", mean=float(cnt.mean()),
     p50=int(np.percentile(cnt, 50)), p90=int(np.percentile(cnt, 90)),
     p99=int(np.percentile(cnt, 99)), max=int(cnt.max()),
     frac_gt6=float((cnt > 6).mean()), frac_gt8=float((cnt > 8).mean()),
     frac_gt12=float((cnt > 12).mean()),
     pairs_per_live_ray=float(cnt.mean()))

# ---- compact live rays to the front (like the pooled loop does) ----
bmin = jnp.min(cs.cl_bbmin, axis=0)
binv = 1.0 / jnp.maximum(jnp.max(cs.cl_bbmax, axis=0) - bmin, 1e-20)
rall = Rays(o, d, jnp.full((N,), 1e-3), jnp.full((N,), 1e6))
kk = coherence_key(rall, alive, bmin, binv)
prm = jax.lax.sort((kk, jnp.arange(N, dtype=jnp.int32)), num_keys=1)[1]
o_s = jnp.take(o, prm, axis=0); d_s = jnp.take(d, prm, axis=0)
alive_s = jnp.take(alive, prm)

# ---- sparse trace on REAL compacted bounce rays at the b1 prefix ----
S1 = 491520
for kp, pb in ((6, 3), (8, 4), (8, 2)):
    rs = Rays(o_s[:S1], d_s[:S1], jnp.full((S1,), 1e-3),
              jnp.full((S1,), 1e6))
    res, ovf = jax.jit(lambda r, a: trace_sparse(
        cs, r, active=a, k_pairs=kp, pair_budget=pb))(rs, alive_s[:S1])
    drops = int(ovf)

    def f(eps, oo, dd, act):
        r = Rays(oo, dd, jnp.full((S1,), 1e-3) + eps, jnp.full((S1,), 1e6))
        return trace_sparse(cs, r, active=act, k_pairs=kp,
                            pair_budget=pb)[0].hits.t

    ms = _timed_loop(f, (o_s[:S1], d_s[:S1], alive_s[:S1]), 4) * 1e3
    emit(stage="sparse_real_b1", k=kp, b=pb, n=S1, ms=ms, dropped=drops,
         live=int(jnp.sum(alive_s[:S1])))

# ---- regroup branch (2-op sort + full row gather) at frame size ----
P = jnp.concatenate([o, d, jnp.zeros((N, 14))], axis=1)
iota = jnp.arange(N, dtype=jnp.int32)

def f_rg(eps, P):
    rr = Rays(P[:, 0:3] + eps, P[:, 3:6], P[:, 6], P[:, 7])
    k2 = coherence_key(rr, P[:, 18] > 0, bmin, binv)
    pp = jax.lax.sort((k2, iota), num_keys=1)[1]
    return jnp.take(P, pp, axis=0)[:, 0]

emit(stage="rg_sortgather_frame", ms=_timed_loop(f_rg, (P,), 6) * 1e3, n=N)

# ---- dense pallas on the same real compacted bounce rays ----
def f_dense(eps, oo, dd, act):
    r = Rays(oo, dd, jnp.full((S1,), 1e-3) + eps, jnp.full((S1,), 1e6))
    return trace_mxu_pallas(cs, r, active=act, tile=1024)[0].hits.t

emit(stage="dense_real_b1", ms=_timed_loop(
    f_dense, (o_s[:S1], d_s[:S1], alive_s[:S1]), 4) * 1e3, n=S1)
print("DONE3", flush=True)
