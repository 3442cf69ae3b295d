"""Round-3 probe: restart width-ladder + rank-phasing + sp_tile sweep
on the real bounce pool, one process (k_first / sp_tile are static jit
args, so the pool build is shared and each variant compiles once).

Baseline to beat (xplane, 2026-08-17): 73.6 ms device / 105.4 ms chained
per frame-width sparse dispatch, of which the restart loop was ~22 ms
(3 iterations at a fixed R/16 = 61440 bucket).

Run from repo root on the TPU: python tools/probe_restart_ladder.py
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
from rayaccel_tpu.ops.trace_sparse import trace_sparse
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
    print(json.dumps(kw), flush=True)


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
emit(stage="bounce_pool", live=int(jnp.sum(alive)))
rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))

# Reference hits for agreement checks (ladder variants must not change
# results beyond the documented pass-cap edge).
ref, ov0 = trace_sparse(cs, rays, active=alive)
ref_tri = np.asarray(ref.hits.tri)
ref_t = np.asarray(ref.hits.t)

VARIANTS = [
    dict(name="ladder_k4", kw={}),
    dict(name="ladder_kfirst2", kw=dict(k_first=2)),
    dict(name="ladder_kfirst1", kw=dict(k_first=1)),
    dict(name="sp2048", kw=dict(sp_tile=2048)),
]

for v in VARIANTS:
    kw = v["kw"]

    def f(eps, o, d, tmin, tmax, act):
        rr = Rays(o, d, tmin + eps, tmax)
        res, ov = trace_sparse(cs, rr, active=act, **kw)
        return res.hits.t

    ms = _timed_loop(f, (rays.o, rays.d, rays.tmin, rays.tmax, alive),
                     4) * 1e3
    res, ov = trace_sparse(cs, rays, active=alive, **kw)
    tri = np.asarray(res.hits.tri)
    t = np.asarray(res.hits.t)
    lv = np.asarray(alive)
    agree = ((tri >= 0) == (ref_tri >= 0)) | ~lv
    t_ok = (np.abs(t - ref_t) <= 1e-3 * np.maximum(np.abs(ref_t), 1)
            ) | (ref_tri < 0) | ~lv
    emit(stage=v["name"], ms=round(ms, 2), overflow=int(ov),
         hitmiss_disagree=int((~agree).sum()),
         t_disagree=int((~t_ok).sum()))
