"""Probe the round-3 'hit-ordered pool' thesis: sort REAL bounce rays by
fine origin morton (hit position ~ hit cluster order) and measure the
dense pallas engine vs sparse on the sorted set."""

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

# fine 30-bit origin morton over live rays, compact to the first 491520
bmin = jnp.min(cs.cl_bbmin, axis=0)
binv = 1.0 / jnp.maximum(jnp.max(cs.cl_bbmax, axis=0) - bmin, 1e-20)
p = (o - bmin[None, :]) * binv[None, :]
q = jnp.clip((p * 1024.0).astype(jnp.int32), 0, 1023)


def spread10(v):
    out = jnp.zeros_like(v)
    for i in range(10):
        out = out | (((v >> i) & 1) << (3 * i))
    return out


morton = (spread10(q[:, 0]) | (spread10(q[:, 1]) << 1)
          | (spread10(q[:, 2]) << 2))
keymat = jnp.where(alive, morton, jnp.int32(0x7FFFFFFF))
prm = jax.lax.sort((keymat, jnp.arange(N, dtype=jnp.int32)), num_keys=1)[1]
S1 = 491520
idx = prm[:S1]
o_s = jnp.take(o, idx, axis=0)
d_s = jnp.take(d, idx, axis=0)
al_s = jnp.take(alive, idx)
emit(stage="pop", live_in_prefix=int(jnp.sum(al_s)))

for name, tile in (("dense_hitorder_t1024", 1024), ("dense_hitorder_t512", 512)):
    res, ov = jax.jit(lambda oo, dd, a: trace_mxu_pallas(
        cs, Rays(oo, dd, jnp.full((S1,), 1e-3), jnp.full((S1,), 1e6)),
        active=a, tile=tile))(o_s, d_s, al_s)
    drops = int(ov)

    def f(eps, oo, dd, act):
        r = Rays(oo, dd, jnp.full((S1,), 1e-3) + eps, jnp.full((S1,), 1e6))
        return trace_mxu_pallas(cs, r, active=act, tile=tile)[0].hits.t

    emit(stage=name, ms=_timed_loop(f, (o_s, d_s, al_s), 4) * 1e3,
         overflow=drops)


def f_sp(eps, oo, dd, act):
    r = Rays(oo, dd, jnp.full((S1,), 1e-3) + eps, jnp.full((S1,), 1e6))
    return trace_sparse(cs, r, active=act)[0].hits.t

emit(stage="sparse_hitorder", ms=_timed_loop(
    f_sp, (o_s, d_s, al_s), 4) * 1e3)
print("DONE6", flush=True)
