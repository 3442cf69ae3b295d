"""Whitted depth-8 LIVE/SP TRAJECTORY probe — CPU-runnable.

The depth-8 redesign (VERDICT r3 #4: stop hauling S x 10 stack columns
through every width shrink) hinges on scene/algorithm properties that
are hardware-independent: how fast the live set decays, how many lanes
ever park (sp > 0), how deep stacks actually get, and how many
push/pop events each bounce iteration sees. This probe measures them at
reduced resolution (every 4th pixel of the battlefield frame) on the
CPU lockstep-BVH engine, so the design is decided before tunnel time is
spent timing the candidates.

Run from repo root: timeout 2400 python tools/probe_whitted_traj.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax

jax.config.update("jax_platforms", "cpu")  # tunnel-independent
jax.config.update("jax_compilation_cache_dir", "/tmp/rayaccel_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.config import EngineOpts
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.render.whitted import (SECONDARY_TMIN, SECONDARY_TMAX,
                                         _whitted_step, _whitted_trace)
from rayaccel_tpu.scene.compile import compile_scene
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.types import Rays


def emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


sd = make_battlefield_like()
ts = compile_scene(sd)
env = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                         sd.env_pixels.shape[0])
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()

# Every 4th pixel in both axes: same scene statistics, 1/16 the lanes.
xg, yg = np.meshgrid(np.arange(0, sd.viewport_width, 4),
                     np.arange(0, sd.viewport_height, 4))
x = jnp.asarray(xg.reshape(-1), jnp.int32)
y = jnp.asarray(yg.reshape(-1), jnp.int32)
N = x.shape[0]
MAXD = 8
S = MAXD + 1
opts = EngineOpts()
key = jax.random.PRNGKey(1)
BK = "xla"


@jax.jit
def stage1(key):
    rays = generate_pixel_rays(cam, x, y, key=key)
    zf = rays.tmax * 0.0
    st = dict(rays=rays, weight=jnp.ones_like(rays.o), depth=x * 0,
              alive=x >= 0, sp=x * 0,
              stk=jnp.broadcast_to(zf[None, None, :], (S, 7, N)),
              stk_w=jnp.broadcast_to(zf[None, None, :], (S, 3, N)),
              radiance=rays.o * 0.0, lane=x * 0,
              traced=jnp.int32(0), dropped=jnp.int32(0))
    hits, surf = _whitted_trace(ts, env, st["rays"], st["alive"], BK,
                                512, 48, opts)
    st = _whitted_step(ts, st, hits, surf, BK, 512, 48, MAXD, S,
                       False, False, opts)
    return dict(st, rays=Rays(st["rays"].o, st["rays"].d,
                              jnp.full((N,), SECONDARY_TMIN, jnp.float32),
                              jnp.full((N,), SECONDARY_TMAX, jnp.float32)))


@jax.jit
def one_bounce(st):
    hits, surf = _whitted_trace(ts, env, st["rays"], st["alive"], BK,
                                512, 48, opts)
    return _whitted_step(ts, st, hits, surf, BK, 512, 48, MAXD, S,
                         False, False, opts)


st = jax.block_until_ready(stage1(key))
emit(stage="pool", n=N, live=int(st["alive"].sum()))

it = 0
prev_sp = np.asarray(st["sp"])
while True:
    alv = np.asarray(st["alive"])
    live = int(alv.sum())
    if live == 0 or it >= 40:
        break
    spv = np.asarray(st["sp"])
    hist = np.bincount(spv[alv], minlength=S)[:6]
    st = one_bounce(st)
    sp2 = np.asarray(st["sp"])
    alv2 = np.asarray(st["alive"])
    emit(stage="iter", it=it, live=live, live_after=int(alv2.sum()),
         live_frac=live / N,
         sp_max=int(spv[alv].max()) if alv.any() else 0,
         parked_entries=int(spv[alv].sum()),
         lanes_sp_gt0=int((spv[alv] > 0).sum()),
         pushes=int(np.maximum(sp2 - spv, 0).sum()),
         pops=int(np.maximum(spv - sp2, 0).sum()),
         sp_hist=[int(v) for v in hist])
    it += 1

print("DONE", flush=True)
