"""Hardware verdict for the wide-restart schedule (k_restart=8) and the
hot_levels=3 haul trim.

1. EXACTNESS on hardware: the K=8 select kernel is a new Mosaic
   specialization (rank_bits=3, K+2 output rows) that interpret-mode
   tests cannot certify (round-3 incident rule). The frame radiance must
   be BITWISE identical between k_restart=None (old schedule) and
   k_restart=8 — both schedules resolve every ray exactly, and shading
   depends only on hits.
2. TIMING: PT depth 0/1/2 and Whitted depth 1/8 frames (compare
   session-2 numbers 54.6/128.4/159.9 and 258.1/611.0 ms).

Run from repo root on the TPU: timeout 4000 python tools/probe_r4b_krestart.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rayaccel_tpu.config import EngineOpts
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera
from rayaccel_tpu.render.pathtracer import pt_trace_frame
from rayaccel_tpu.render.whitted import whitted_trace_frame
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.environment import create_environment
from rayaccel_tpu.utils.profiling import _timed_loop

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
key = jax.random.PRNGKey(3)


def emit(**kw):
    print(json.dumps(kw), flush=True)


OLD = EngineOpts(k_restart=None)
NEW = EngineOpts(k_restart=8)

# ---- exactness: bitwise frame agreement old vs new schedule ----
rad_o, tr_o, dr_o = pt_trace_frame(
    cs, env, cam, xs_s, ys_s, al_s, key, 2, backend="pallas", tile=1024,
    bounce_backend="sparse", opts=OLD)
rad_n, tr_n, dr_n = pt_trace_frame(
    cs, env, cam, xs_s, ys_s, al_s, key, 2, backend="pallas", tile=1024,
    bounce_backend="sparse", opts=NEW)
a, b = np.asarray(rad_o), np.asarray(rad_n)
emit(stage="pt2_bitwise", n_diff=int((a != b).sum()),
     max_abs=float(np.abs(a - b).max()),
     traced_old=int(tr_o), traced_new=int(tr_n))

rad_o, tr_o, dr_o = whitted_trace_frame(
    cs, env, cam, xs_s, ys_s, al_s, key, 8, 9, backend="pallas",
    tile=1024, bounce_backend="sparse", opts=OLD)
rad_n, tr_n, dr_n = whitted_trace_frame(
    cs, env, cam, xs_s, ys_s, al_s, key, 8, 9, backend="pallas",
    tile=1024, bounce_backend="sparse", opts=NEW)
a, b = np.asarray(rad_o), np.asarray(rad_n)
emit(stage="whitted8_bitwise", n_diff=int((a != b).sum()),
     max_abs=float(np.abs(a - b).max()),
     traced_old=int(tr_o), traced_new=int(tr_n),
     dropped_old=int(dr_o), dropped_new=int(dr_n))

# ---- timing (new schedule is the production default) ----
for depth in (0, 1, 2):
    def f(eps, z, depth=depth):
        rad, traced, dropped = pt_trace_frame(
            cs, env, cam, xs_s, ys_s, al_s,
            jax.random.fold_in(jax.random.PRNGKey(1),
                               (eps * 1e9).astype(jnp.int32)), depth,
            backend="pallas", tile=1024, bounce_backend="sparse",
            opts=NEW)
        return rad[:, :, 0] * 1.0 + eps

    ms = _timed_loop(f, (jnp.float32(0),), 4) * 1e3
    emit(stage="pt_frame_krestart8", depth=depth, ms=round(ms, 2))

for depth in (1, 8):
    def g(eps, z, depth=depth):
        rad, traced, dropped = whitted_trace_frame(
            cs, env, cam, xs_s, ys_s, al_s,
            jax.random.fold_in(jax.random.PRNGKey(1),
                               (eps * 1e9).astype(jnp.int32)), depth, 9,
            backend="pallas", tile=1024, bounce_backend="sparse",
            opts=NEW)
        return rad[:, :, 0] * 1.0 + eps

    ms = _timed_loop(g, (jnp.float32(0),), 3) * 1e3
    emit(stage="whitted_frame_krestart8", max_depth=depth, ms=round(ms, 2))

print("DONE", flush=True)
