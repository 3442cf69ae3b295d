"""Round-4 lever probe: packed 1-operand lattice sort + quad env gather.

On a REAL frame-width bounce pool (983k lanes), measures:

  1. trace_sparse k4_full with the packed uint32 lattice sort (compare
     vs the 2-operand baseline ~92.6 ms chained, docs/PERF_NOTES.md) —
     plus a hit/t agreement check vs the pre-change semantics is covered
     by the bench oracle; here we check overflow==0 and hit counts.
  2. env samplers head-to-head at piece width 1.29M: quad row gather vs
     one-hot matmul (expected ~2 vs ~7.5 ms).

Run from repo root: timeout 2400 python tools/probe_r4_sort_env.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.environment import (Environment, create_environment,
                                      sample_environment_onehot)
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
n_live = int(jnp.sum(alive))
emit(stage="bounce_pool", n=N, live=n_live)

rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))


def f(eps, o, d, tmin, tmax, act):
    rr = Rays(o, d, tmin + eps, tmax)
    res, ov = trace_sparse(cs, rr, active=act)
    return res.hits.t

ms = _timed_loop(f, (rays.o, rays.d, rays.tmin, rays.tmax, alive), 4) * 1e3
res, ov = trace_sparse(cs, rays, active=alive)
n_hit = int(jnp.sum(res.hits.tri >= 0))
emit(stage="sparse_k4_full_packedsort", ms=ms, overflow=int(ov),
     hits=n_hit)

# ---- env samplers at piece width ----
M = 1290240   # ~1.31N, the fast-shrink piece total
dk = jax.random.normal(jax.random.PRNGKey(7), (M, 3))
dirs = dk / jnp.linalg.norm(dk, axis=1, keepdims=True)
env_q = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                           sd.env_pixels.shape[0])
env_oh = Environment(env_q.pixels)        # quad=None -> one-hot path


def fq(eps, dd):
    return sample_environment_onehot(env_q, dd + eps)


def foh(eps, dd):
    return sample_environment_onehot(env_oh, dd + eps)

emit(stage="env_quad_1p29M", ms=_timed_loop(fq, (dirs,), 8) * 1e3)
emit(stage="env_onehot_1p29M", ms=_timed_loop(foh, (dirs,), 8) * 1e3)
print("DONE", flush=True)
