"""Round-4 frame probe: lane-keyed-RNG cost + primary wave width.

Measures pt_trace_frame at depth 0/1/2 for WAVE = 65536 (production) and
122880 (8 waves/frame instead of 15; the dense kernel measured 59.1 vs
62.5 ns/ray at 131k in isolation, docs/PERF_NOTES.md round-3 sweep), on
the lane-keyed bounce RNG introduced this round (one extra threefry pass
per bounce — depth deltas vs the r3 numbers 69.4 / +81.2 / +26.8 ms give
its real cost).

Run from repo root: timeout 2400 python tools/probe_r4_frame.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from rayaccel_tpu.camera import Camera
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.render.pathtracer import pt_trace_frame
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
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)

for WAVE in (65536, 122880):
    W = N // WAVE
    xs_s = jnp.asarray(xs.reshape(W, WAVE), jnp.int32)
    ys_s = jnp.asarray(ys.reshape(W, WAVE), jnp.int32)
    al_s = jnp.asarray((perm >= 0).reshape(W, WAVE))
    for depth in (0, 1, 2):
        def f(eps, z, depth=depth, xs_s=xs_s, ys_s=ys_s, al_s=al_s):
            rad, traced, dropped = pt_trace_frame(
                cs, env, cam, xs_s, ys_s, al_s,
                jax.random.fold_in(jax.random.PRNGKey(1),
                                   (eps * 1e9).astype(jnp.int32)), depth,
                backend="pallas", tile=1024, sampler="uniform",
                bounce_backend="sparse")
            return rad[:, :, 0] * 1.0 + eps

        ms = _timed_loop(f, (jnp.float32(0),), 4) * 1e3
        emit(stage="frame_depth_r4", wave=WAVE, depth=depth, ms=ms)

print("DONE", flush=True)
