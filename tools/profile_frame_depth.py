"""Frame-level decomposition: pt_trace_frame at depth 0/1/2 + new engine
cost on real bounce rays."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.render.pathtracer import (pt_trace_frame, _shade_advance,
                                            _trace_and_surface)
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
env = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                         sd.env_pixels.shape[0])
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height)
key = jax.random.PRNGKey(0)
N = 983040
WAVE = 65536
W = N // WAVE
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)
xs_s = jnp.asarray(xs.reshape(W, WAVE), jnp.int32)
ys_s = jnp.asarray(ys.reshape(W, WAVE), jnp.int32)
al_s = jnp.asarray((perm >= 0).reshape(W, WAVE))
cam_arr = cam.as_arrays()


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


# frame at depths 0/1/2
for depth in (0, 1, 2):
    def f(eps, k0):
        rad, traced, dropped = pt_trace_frame(
            cs, env, cam_arr, xs_s, ys_s, al_s,
            jax.random.fold_in(jax.random.PRNGKey(1), k0), depth,
            backend="pallas", tile=1024, sampler="uniform",
            bounce_backend="sparse")
        return rad[:, :, 0] * 1.0 + eps

    # vary the key per iteration through eps-free chaining: fold eps int
    ms = _timed_loop(lambda eps, z: f(eps, (eps * 1e9).astype(jnp.int32)),
                     (jnp.float32(0),), 4) * 1e3
    emit(stage="frame_depth", depth=depth, ms=ms)

# real bounce rays again for the new engine
@jax.jit
def make_bounce_wave(x, y, alive0, k):
    rays = generate_pixel_rays(cam_arr, x, y, key=k)
    hits, surf, _ = _trace_and_surface(cs, rays, alive0, "pallas", 1024, 48)
    r2, w2, d2, a2, md, mw = _shade_advance(
        hits, surf, rays, jnp.ones((WAVE, 3)), jnp.zeros((WAVE,), jnp.int32),
        alive0, rays.d, jnp.zeros((WAVE, 3)), jax.random.fold_in(k, 1), 2)
    return r2, a2


os_, ds_, al_ = [], [], []
for w in range(W):
    r2, a2 = make_bounce_wave(xs_s[w], ys_s[w], al_s[w],
                              jax.random.fold_in(key, w))
    os_.append(r2.o); ds_.append(r2.d); al_.append(a2)
o = jnp.concatenate(os_); d = jnp.concatenate(ds_)
alive = jnp.concatenate(al_)

for mp in (1, 4):
    res, ovf = jax.jit(lambda r, a: trace_sparse(
        cs, r, active=a, max_passes=mp))(
        Rays(o, d, jnp.full((N,), 1e-3), jnp.full((N,), 1e6)), alive)

    def f2(eps, oo, dd, act):
        r = Rays(oo, dd, jnp.full((N,), 1e-3) + eps, jnp.full((N,), 1e6))
        return trace_sparse(cs, r, active=act, max_passes=mp)[0].hits.t

    emit(stage="sparse_v2_frame_real", max_passes=mp,
         ms=_timed_loop(f2, (o, d, alive), 3) * 1e3, overflow=int(ovf))

# prim_step equivalent: gen + trace + shade one wave
def f3(eps, x, y, a0):
    rays = generate_pixel_rays(cam_arr, x, y, key=jax.random.PRNGKey(3))
    rays = Rays(rays.o, rays.d, rays.tmin + eps, rays.tmax)
    hits, surf, ov = _trace_and_surface(cs, rays, a0, "pallas", 1024, 48)
    out = _shade_advance(hits, surf, rays, jnp.ones((WAVE, 3)),
                         jnp.zeros((WAVE,), jnp.int32), a0, rays.d,
                         jnp.zeros((WAVE, 3)), jax.random.PRNGKey(4), 2)
    return out[0].o[:, 0] + out[1][:, 0]

emit(stage="prim_step_wave", ms=_timed_loop(
    f3, (xs_s[7], ys_s[7], al_s[7]), 8) * 1e3)
print("DONE5", flush=True)
