"""jax.profiler trace of one sparse bounce trace on hardware, with a
self-contained parser: prints the top device ops by total duration.

Confirms the k4_full decomposition in docs/PERF_NOTES.md (attr gather /
pair F-gather / select kernel split) from the XLA op level instead of
arithmetic. Run from repo root: python tools/profile_xplane.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import gzip
import json
import collections

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
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

# Warm (compile outside the trace), then trace 3 distinct dispatches.
res, ov = trace_sparse(cs, rays, active=alive)
float(np.asarray(res.hits.t[0]))

tdir = "/tmp/jax-trace-sparse"
with jax.profiler.trace(tdir):
    for i in range(3):
        r2 = Rays(o=rays.o, d=rays.d, tmin=rays.tmin + 1e-6 * (i + 1),
                  tmax=rays.tmax)
        res, ov = trace_sparse(cs, r2, active=alive)
        float(np.asarray(res.hits.t[i]))     # value sync inside the trace

files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
print("trace files:", files, flush=True)
tot = collections.Counter()
cnt = collections.Counter()
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        # Device lanes only: keep XLA op events (they carry 'args' with hlo).
        name = ev.get("name", "")
        dur = ev.get("dur", 0)  # microseconds
        if dur <= 0:
            continue
        pid_name = ev.get("pid")
        tot[name] += dur
        cnt[name] += 1

for name, us in tot.most_common(40):
    print(f"{us/1000:10.3f} ms  x{cnt[name]:<5d} {name[:120]}", flush=True)
