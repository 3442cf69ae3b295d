"""Focused: select-kernel cost after the bb lane-alignment fix.

Round-3 probe (tools/profile_rank_phase.py) showed the sparse bounce
pass is dominated by ~50-60ms of pair-volume-independent cost at frame
width; the select kernel's (8, n_cp) bb block paid a lane->sublane
transpose of every coordinate row per grid step. This measures, on the
same real-bounce pool: select-only at K=4 and K=1, and the full k4
multipass — directly comparable to rank_phase.log's numbers.
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
N = 983040
WAVE = 65536
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)


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
emit(stage="bounce_pool", n=N, live=int(jnp.sum(alive)))

rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))

oc = tuple(o[:, a] for a in range(3))
inv3 = safe_inv_dir(d)
invc = tuple(inv3[:, a] for a in range(3))
tmax_eff = jnp.where(alive, rays.tmax, -1.0)

for K in (4, 1):
    def sel(eps, tmin, K=K):
        lv, lid, spill, cnt = _select_nearest_pallas(
            cs, oc, invc, tmin + eps, tmax_eff, K, False)
        return lid.astype(jnp.float32) + lv
    ms = _timed_loop(sel, (rays.tmin,), 6) * 1e3
    emit(stage="select_only_bbfix", K=K, ms=round(ms, 3))


def f_k4(eps, o, d, tmin, tmax, act):
    rr = Rays(o, d, tmin + eps, tmax)
    res, ov = trace_sparse(cs, rr, active=act)
    return res.hits.t


ms = _timed_loop(f_k4, (rays.o, rays.d, rays.tmin, rays.tmax, alive),
                 4) * 1e3
_, ov = trace_sparse(cs, rays, active=alive)
emit(stage="sparse_k4_full_bbfix", ms=round(ms, 3), overflow=int(ov))
