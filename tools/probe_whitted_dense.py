"""Whitted bounce coherence probe: dense vs sparse engine on REAL
whitted bounce pools (round-4 depth-8 lever candidate).

PT diffuse bounces are scattered (engine shootout: dense 21.3ms vs
sparse 14.1ms per 65k) — but Whitted bounces are MIRROR reflections and
refractions whose directions are deterministic functions of coherent
primaries, and the pooled tree loop preserves frame order (live-first
shrink sorts are stable), so per-tile cluster unions may stay small
enough for the dense work-queue kernel's caps. If dense wins at 65k
wave granularity, the depth-8 loop gains a scanned-dense bounce mode.

Measures, on the REAL bounce pool after stage 1 (depth-8 battlefield):
  - dense pallas per-65k-wave time + per-tile union overflow counts,
  - sparse per-65k-wave time,
  - the same at bounce 2-3 pools (coherence decays with depth).

Run from repo root: timeout 3000 python tools/probe_whitted_dense.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.config import EngineOpts
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.render.whitted import (SECONDARY_TMIN, SECONDARY_TMAX,
                                         _whitted_step, _whitted_trace)
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

WAVE = 65536


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


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
MAXD = 8
S = 9
opts = EngineOpts()
key = jax.random.PRNGKey(3)


@jax.jit
def make_pool(x, y, alive0, key):
    """Stage 1 (primaries on dense) -> the frame-order bounce pool."""
    rays = generate_pixel_rays(cam, x, y, key=key)
    zf = rays.tmax * 0.0
    st = dict(rays=rays, weight=jnp.ones_like(rays.o), depth=x * 0,
              alive=alive0, sp=x * 0,
              stk=jnp.broadcast_to(zf[None, None, :], (S, 7, N)),
              stk_w=jnp.broadcast_to(zf[None, None, :], (S, 3, N)),
              radiance=rays.o * 0.0, lane=x * 0,
              traced=jnp.int32(0), dropped=jnp.int32(0))
    hits, surf = _whitted_trace(cs, env, st["rays"], st["alive"],
                                "pallas", 1024, 48, opts)
    st = _whitted_step(cs, st, hits, surf, "pallas", 1024, 48, MAXD, S,
                       False, False, opts)
    return dict(st, rays=Rays(st["rays"].o, st["rays"].d,
                              jnp.full((N,), SECONDARY_TMIN, jnp.float32),
                              jnp.full((N,), SECONDARY_TMAX, jnp.float32)))


@jax.jit
def advance(st):
    """One pooled bounce on the sparse engine (production path)."""
    hits, surf = _whitted_trace(cs, env, st["rays"], st["alive"],
                                "sparse", 1024, 48, opts)
    return _whitted_step(cs, st, hits, surf, "sparse", 1024, 48, MAXD, S,
                         False, False, opts)


print("building pool...", flush=True)
st = jax.block_until_ready(make_pool(x, y, alive0, key))

for bounce in range(3):
    alive = st["alive"]
    n_live = int(np.asarray(alive).sum())
    emit(stage="pool", bounce=bounce, live=n_live)
    if n_live == 0:
        break
    rays = st["rays"]

    # Per-65k-wave comparison over the 4 MOST-LIVE waves of the pool
    # (frame order: leading waves are often pure sky => all dead).
    per_wave = np.asarray(alive).reshape(-1, WAVE).sum(axis=1)
    emit(stage="wave_live", bounce=bounce,
         per_wave=[int(v) for v in per_wave])
    for w in [int(i) for i in np.argsort(per_wave)[::-1][:4]]:
        sl = slice(w * WAVE, (w + 1) * WAVE)
        rw = Rays(rays.o[sl], rays.d[sl], rays.tmin[sl], rays.tmax[sl])
        aw = alive[sl]
        live_w = int(np.asarray(aw).sum())
        if live_w == 0:
            continue

        def f_dense(eps, z, rw=rw, aw=aw):
            r2 = Rays(rw.o + eps, rw.d, rw.tmin, rw.tmax)
            res, ov = trace_mxu_pallas(cs, r2, env=env, active=aw,
                                       tile=1024)
            return res.hits.t[:8] + ov.astype(jnp.float32)

        def f_sparse(eps, z, rw=rw, aw=aw):
            r2 = Rays(rw.o + eps, rw.d, rw.tmin, rw.tmax)
            res, ov = trace_sparse(cs, r2, env=env, active=aw)
            return res.hits.t[:8] + ov.astype(jnp.float32)

        ms_d = _timed_loop(f_dense, (jnp.float32(0),), 6) * 1e3
        ms_s = _timed_loop(f_sparse, (jnp.float32(0),), 6) * 1e3
        # Union-cap overflow: dense result validity check.
        _, ov = jax.block_until_ready(
            trace_mxu_pallas(cs, rw, env=env, active=aw, tile=1024))
        emit(stage="wave", bounce=bounce, wave=w, live=live_w,
             dense_ms=ms_d, sparse_ms=ms_s, dense_overflow=int(ov))

    st = jax.block_until_ready(advance(st))

print("DONE", flush=True)
