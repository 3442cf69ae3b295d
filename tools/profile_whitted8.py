"""Whitted depth-8 frame decomposition (round-4 lever, VERDICT r3 #4).

The pooled tree loop is the worst bench line (5.2 Mrays/s). Before
touching it, measure where a depth-8 frame actually goes:

  1. whitted_trace_frame wall time at max_depth 1/2/4/8 (the depth
     deltas are the trustworthy per-tree-level costs),
  2. an EAGER replay of the pooled bounce loop — one jitted step per
     iteration with live-count / sp-max / parked-count readbacks — so
     the live-set trajectory and the per-iteration cost are visible
     (the while_loop hides both from coarse profiling).

Run from repo root: timeout 2400 python tools/profile_whitted8.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.camera import Camera
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.render.whitted import (_whitted_step, _whitted_trace,
                                         whitted_trace_frame)
from rayaccel_tpu.config import EngineOpts
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

SECONDARY_TMIN = 1e-3
SECONDARY_TMAX = 1e6


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
WAVE = 65536
W = N // WAVE
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)
xs_s = jnp.asarray(xs.reshape(W, WAVE), jnp.int32)
ys_s = jnp.asarray(ys.reshape(W, WAVE), jnp.int32)
al_s = jnp.asarray((perm >= 0).reshape(W, WAVE))
opts = EngineOpts()

# ---- 1. frame wall time by max_depth ----
for depth in (1, 2, 4, 8):
    S = depth + 1

    def f(eps, k0, depth=depth, S=S):
        rad, traced, dropped = whitted_trace_frame(
            cs, env, cam, xs_s, ys_s, al_s,
            jax.random.fold_in(jax.random.PRNGKey(1),
                               (eps * 1e9).astype(jnp.int32)), depth, S,
            backend="pallas", tile=1024, bounce_backend="sparse")
        return rad[:, :, 0] * 1.0 + eps

    ms = _timed_loop(lambda eps, z: f(eps, 0), (jnp.float32(0),), 3) * 1e3
    emit(stage="whitted_frame", max_depth=depth, ms=ms)

# ---- 2. eager replay of the depth-8 pooled loop ----
MAXD = 8
S = MAXD + 1
key = jax.random.PRNGKey(1)


@jax.jit
def stage1(key):
    # Replicates whitted_trace_frame stage 1 at wave granularity.
    def prim_step(carry, inputs):
        w, = carry
        x, y, alive0 = inputs
        from rayaccel_tpu.camera import generate_pixel_rays
        wkey = jax.random.fold_in(key, w)
        rays = generate_pixel_rays(cam, x, y, key=wkey)
        zf = rays.tmax * 0.0
        st0 = dict(rays=rays, weight=jnp.ones_like(rays.o), depth=x * 0,
                   alive=alive0, sp=x * 0,
                   stk=jnp.broadcast_to(zf[None, None, :], (S, 7, WAVE)),
                   stk_w=jnp.broadcast_to(zf[None, None, :], (S, 3, WAVE)),
                   radiance=rays.o * 0.0, lane=x * 0,
                   traced=jnp.sum(x) * 0, dropped=jnp.sum(x) * 0)

        def live(st):
            hits, surf = _whitted_trace(cs, env, st["rays"], st["alive"],
                                        "pallas", 1024, 48, opts)
            return _whitted_step(cs, st, hits, surf, "pallas", 1024, 48,
                                 MAXD, S, False, False, opts)

        st = jax.lax.cond(jnp.any(alive0), live, lambda s: s, st0)
        out = (st["rays"].o, st["rays"].d, st["weight"], st["depth"],
               st["alive"], st["sp"], st["stk"], st["stk_w"],
               st["radiance"])
        return (w + 1,), out

    (_w,), stacked = jax.lax.scan(prim_step, (jnp.int32(0),),
                                  (xs_s, ys_s, al_s))
    o_s, d_s, w_s, dep_s, al2, sp_s, stk_s, stkw_s, rad_s = stacked

    def flat(a):
        return a.reshape((N,) + a.shape[2:])

    return dict(
        rays=Rays(flat(o_s), flat(d_s),
                  jnp.full((N,), SECONDARY_TMIN, jnp.float32),
                  jnp.full((N,), SECONDARY_TMAX, jnp.float32)),
        weight=flat(w_s), depth=flat(dep_s), alive=flat(al2),
        sp=flat(sp_s),
        stk=stk_s.transpose(1, 2, 0, 3).reshape(S, 7, N),
        stk_w=stkw_s.transpose(1, 2, 0, 3).reshape(S, 3, N),
        radiance=flat(rad_s), lane=jnp.arange(N, dtype=jnp.int32),
        traced=jnp.int32(0), dropped=jnp.int32(0))


@jax.jit
def one_bounce(st):
    hits, surf = _whitted_trace(cs, env, st["rays"], st["alive"],
                                "sparse", 1024, 48, opts)
    return _whitted_step(cs, st, hits, surf, "sparse", 1024, 48, MAXD, S,
                         False, False, opts)


print("compiling stage1...", flush=True)
st = jax.block_until_ready(stage1(key))
emit(stage="eager_pool", live=int(st["alive"].sum()))

print("compiling one_bounce...", flush=True)
st1 = one_bounce(st)
jax.block_until_ready(st1["alive"])

it = 0
while True:
    live = int(st["alive"].sum())
    if live == 0 or it >= 40:
        break
    spv = np.asarray(st["sp"])
    alv = np.asarray(st["alive"])
    sp_max = int(spv[alv].max()) if alv.any() else 0
    parked = int(spv[alv].sum()) if alv.any() else 0
    t0 = time.perf_counter()
    st = one_bounce(st)
    live_after = int(st["alive"].sum())      # value readback = sync
    dt = (time.perf_counter() - t0) * 1e3
    emit(stage="bounce_iter", it=it, live=live, live_after=live_after,
         sp_max=sp_max, parked=parked, ms=round(dt, 1))
    it += 1

print("DONE", flush=True)
