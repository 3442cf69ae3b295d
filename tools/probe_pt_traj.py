"""PT bounce-pool LIVE TRAJECTORY probe — CPU-runnable.

Decides the pt_trace_frame ladder ratio for deep-bounce configs
(BASELINE config 3: 8 bounces, full BSDF): if live decays slowly like
the Whitted trees (probe_whitted_traj.py), a ratio-2 ladder saves
full-width bounce iterations; if it collapses geometrically (the
russian-roulette-free weight cutoff kills most paths fast), ratio 4
stays right. Hardware-independent scene/algorithm property, measured
at 1/16 resolution on the CPU lockstep engine.

Run from repo root: timeout 2400 python tools/probe_pt_traj.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rayaccel_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.config import EngineOpts
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.scene.compile import compile_scene
from rayaccel_tpu.scene.loader import make_battlefield_like


def emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


sd = make_battlefield_like()
ts = compile_scene(sd)
env = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                         sd.env_pixels.shape[0])
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()

xg, yg = np.meshgrid(np.arange(0, sd.viewport_width, 4),
                     np.arange(0, sd.viewport_height, 4))
x = jnp.asarray(xg.reshape(-1), jnp.int32)
y = jnp.asarray(yg.reshape(-1), jnp.int32)
N = x.shape[0]
MAXD = 8
opts = EngineOpts()
key = jax.random.PRNGKey(1)
lane = jnp.arange(N, dtype=jnp.int32)


@jax.jit
def stage1(key):
    rays = generate_pixel_rays(cam, x, y, key=key)
    alive0 = x >= 0
    zero3 = jnp.zeros((N, 3), jnp.float32)
    ones3 = jnp.ones((N, 3), jnp.float32)
    hits, surf, _ = _trace_and_surface(ts, rays, alive0, "xla", 512, 48,
                                       opts)
    return _shade_advance(hits, surf, rays, ones3,
                          jnp.zeros((N,), jnp.int32), alive0, rays.d,
                          zero3, jax.random.fold_in(key, 1), MAXD,
                          lane=lane)


@jax.jit
def bounce(rays, weight, depth, alive, miss_d, miss_w, b):
    hits, surf, _ = _trace_and_surface(ts, rays, alive, "xla", 512, 48,
                                       opts)
    skey = jax.random.fold_in(key, 4096 + b)
    return _shade_advance(hits, surf, rays, weight, depth, alive,
                          miss_d, miss_w, skey, MAXD, lane=lane)


rays, weight, depth, alive, miss_d, miss_w = stage1(key)
emit(stage="pool", n=N, live=int(alive.sum()))

for b in range(MAXD + 2):
    live = int(np.asarray(alive).sum())
    if live == 0:
        break
    rays, weight, depth, alive, miss_d, miss_w = bounce(
        rays, weight, depth, alive, miss_d, miss_w, jnp.int32(b))
    emit(stage="iter", it=b, live=live,
         live_after=int(np.asarray(alive).sum()), live_frac=live / N)

print("DONE", flush=True)
