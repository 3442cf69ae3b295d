"""Width-consistency check for the sparse engine on real hardware.

The round-3 headline bench shows ~9% fewer rays traced and dropped
16586 (vs 5 in round 2) — path statistics changed. The CPU suite is
green at 4k scale, so if there is a regression it is FRAME-scale only
(bucket dispatch, select tiling, item buckets). This traces the SAME
real bounce pool (a) in one 983k call, (b) in 15 chunked 65k calls, and
(c) checks a 65k subset against the lockstep BVH oracle. Per-ray
winners must agree (near-tie tolerance).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.compile import compile_scene
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace import trace_bvh
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
ts = compile_scene(sd)
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)
N = 983040
WAVE = 65536
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)


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
rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))
live = np.asarray(alive)
print(json.dumps({"stage": "pool", "live": int(live.sum())}), flush=True)

# (a) one full-width call
res_full, ov_full = trace_sparse(cs, rays, active=alive)
tri_full = np.asarray(res_full.hits.tri)
t_full = np.asarray(res_full.hits.t)
print(json.dumps({"stage": "full", "overflow": int(ov_full),
                  "hits": int((tri_full[live] >= 0).sum())}), flush=True)

# (b) 15 chunked calls
tri_c = np.empty_like(tri_full)
t_c = np.empty_like(t_full)
ov_c = 0
for w in range(N // WAVE):
    sl = slice(w * WAVE, (w + 1) * WAVE)
    rw = Rays(o=rays.o[sl], d=rays.d[sl], tmin=rays.tmin[sl],
              tmax=rays.tmax[sl])
    res, ov = trace_sparse(cs, rw, active=alive[sl])
    tri_c[sl] = np.asarray(res.hits.tri)
    t_c[sl] = np.asarray(res.hits.t)
    ov_c += int(ov)
print(json.dumps({"stage": "chunked", "overflow": ov_c,
                  "hits": int((tri_c[live] >= 0).sum())}), flush=True)

hit_mismatch = ((tri_full >= 0) != (tri_c >= 0)) & live
t_mismatch = (np.abs(t_full - t_c) > 1e-3 * np.maximum(np.abs(t_full), 1)
              ) & live & (tri_full >= 0) & (tri_c >= 0)
print(json.dumps({
    "stage": "full_vs_chunked",
    "hitmiss_mismatch": int(hit_mismatch.sum()),
    "t_mismatch": int(t_mismatch.sum()),
}), flush=True)
if hit_mismatch.sum():
    idx = np.nonzero(hit_mismatch)[0][:10]
    for i in idx:
        print(json.dumps({"i": int(i), "tile": int(i // 1024),
                          "tri_full": int(tri_full[i]),
                          "tri_chunk": int(tri_c[i]),
                          "t_full": float(t_full[i]),
                          "t_chunk": float(t_c[i])}), flush=True)

# (c) lockstep BVH oracle on the MOST-LIVE 65k wave (wave 0 can be all
# sky/dead, which would make this check vacuous — n_live is printed so a
# vacuous run is visible)
w_best = int(np.argmax(live.reshape(-1, WAVE).sum(axis=1)))
sl = slice(w_best * WAVE, (w_best + 1) * WAVE)
rw = Rays(o=rays.o[sl], d=rays.d[sl], tmin=rays.tmin[sl], tmax=rays.tmax[sl])
h_ref = trace_bvh(ts, rw, active=alive[sl])
tri_r = np.asarray(h_ref.tri)
t_r = np.asarray(h_ref.t)
lv = live[sl]
agree_hit = ((tri_r >= 0) == (tri_full[sl] >= 0)) | ~lv
t_ok = (np.abs(t_r - t_full[sl]) <= 1e-3 * np.maximum(np.abs(t_r), 1)
        ) | (tri_r < 0) | ~lv
print(json.dumps({
    "stage": "vs_bvh_oracle",
    "hitmiss_disagree": int((~agree_hit).sum()),
    "t_disagree": int((~t_ok).sum()),
    "n_live": int(lv.sum()),
}), flush=True)
