"""Round-4 gather-free staged-shrink verification on hardware.

Measures the frame paths the shrink change touched (commit "Gather-free
staged shrink for both frame pools"):

  - pt_trace_frame depth 0/1/2 at the production wave (compare vs the
    hardware-session-1 numbers 55.8 / 130.2 / 169.9 ms),
  - whitted_trace_frame depth 1/8 (the depth-8 bench config; compare vs
    round-3's ~650-700 ms estimate and the ratio-2-ladder prediction).

Run from repo root: timeout 3000 python tools/probe_r4_shrink.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from rayaccel_tpu.camera import Camera
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.render.pathtracer import pt_trace_frame
from rayaccel_tpu.render.whitted import whitted_trace_frame
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.utils.profiling import _timed_loop


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

for depth in (0, 1, 2):
    def f(eps, z, depth=depth):
        rad, traced, dropped = pt_trace_frame(
            cs, env, cam, xs_s, ys_s, al_s,
            jax.random.fold_in(jax.random.PRNGKey(1),
                               (eps * 1e9).astype(jnp.int32)), depth,
            backend="pallas", tile=1024, sampler="uniform",
            bounce_backend="sparse")
        return rad[:, :, 0] * 1.0 + eps

    ms = _timed_loop(f, (jnp.float32(0),), 4) * 1e3
    emit(stage="pt_frame_shrink", wave=WAVE, depth=depth, ms=ms)

for depth in (1, 8):
    S = depth + 1

    def g(eps, z, depth=depth, S=S):
        rad, traced, dropped = whitted_trace_frame(
            cs, env, cam, xs_s, ys_s, al_s,
            jax.random.fold_in(jax.random.PRNGKey(1),
                               (eps * 1e9).astype(jnp.int32)), depth, S,
            backend="pallas", tile=1024, bounce_backend="sparse")
        return rad[:, :, 0] * 1.0 + eps

    ms = _timed_loop(lambda eps, z: g(eps, z), (jnp.float32(0),), 3) * 1e3
    emit(stage="whitted_frame_shrink", max_depth=depth, ms=ms)

print("DONE", flush=True)
