"""Round-3 lever timing: sparse k4_full (8-col gather + XLA rebuild)
and the decode-trimmed dense primary kernel, on the real bounce pool.

Baselines to beat (docs/PERF_NOTES.md round-3 decomposition):
  sparse_k4_full 115.5 ms, dense_primary_65k 3.54 ms.

Run from repo root on the TPU: python tools/probe_r3_timing.py
K_PER_STEP env override is gone (knobs live in Configuration now); pass
k_step to trace_mxu_pallas to compare 4 vs 8.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas, K_PER_STEP
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
    print(json.dumps(kw), flush=True)


# ---- dense primary trace at 65k (decode-trimmed kernel) ----
x0 = jnp.asarray(xs[:WAVE], jnp.int32)
y0 = jnp.asarray(ys[:WAVE], jnp.int32)
a0 = jnp.asarray(perm[:WAVE] >= 0)
prays = generate_pixel_rays(cam, x0, y0, key=key)


def f_dense(eps, o, d, tmin, tmax, act):
    rr = Rays(o, d, tmin + eps, tmax)
    res, _ = trace_mxu_pallas(cs, rr, active=act, tile=1024)
    return res.hits.t

ms = _timed_loop(f_dense, (prays.o, prays.d, prays.tmin, prays.tmax, a0),
                 8) * 1e3
emit(stage="dense_primary_65k", k_step=K_PER_STEP, ms=round(ms, 3))

# Decode-trim correctness gate: trimmed kernel vs the lockstep BVH
# oracle on the primary wave (hardware lowering, not interpret).
from rayaccel_tpu.scene.compile import compile_scene
from rayaccel_tpu.ops.trace import trace_bvh

ts = compile_scene(sd)
res_p, _ = trace_mxu_pallas(cs, prays, active=a0, tile=1024)
h_ref = trace_bvh(ts, prays, active=a0)
tri_p = np.asarray(res_p.hits.tri); t_p = np.asarray(res_p.hits.t)
tri_r = np.asarray(h_ref.tri); t_r = np.asarray(h_ref.t)
lv = np.asarray(a0)
agree = ((tri_r >= 0) == (tri_p >= 0)) | ~lv
t_ok = (np.abs(t_r - t_p) <= 1e-3 * np.maximum(np.abs(t_r), 1)
        ) | (tri_r < 0) | ~lv
emit(stage="dense_vs_bvh_oracle", hitmiss_disagree=int((~agree).sum()),
     t_disagree=int((~t_ok).sum()), n_live=int(lv.sum()))

if _os.environ.get("RACC_PROBE_DENSE_ONLY"):
    _sys.exit(0)

# ---- real bounce pool ----
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
emit(stage="bounce_pool", live=int(jnp.sum(alive)))
rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))


def f_sparse(eps, o, d, tmin, tmax, act):
    rr = Rays(o, d, tmin + eps, tmax)
    res, ov = trace_sparse(cs, rr, active=act)
    return res.hits.t

ms = _timed_loop(f_sparse, (rays.o, rays.d, rays.tmin, rays.tmax, alive),
                 4) * 1e3
_, ov = trace_sparse(cs, rays, active=alive)
emit(stage="sparse_k4_full", ms=round(ms, 3), overflow=int(ov))
