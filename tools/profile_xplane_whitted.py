"""jax.profiler trace of whitted_trace_frame at depth 8: exclusive
self-time per op, to find where the 611 ms depth-8 frame goes (the
bench's worst config). Suspects: the (S,7,R)/(S,3,R) stack wheres paid
at stage width every iteration, the per-iteration sparse trace terms,
and the shrink hauls.

Run from repo root on the TPU:
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  timeout 3600 python tools/profile_xplane_whitted.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import collections
import glob
import gzip
import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera
from rayaccel_tpu.render.whitted import whitted_trace_frame
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.environment import create_environment

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
env = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                         sd.env_pixels.shape[0])
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)
N = 983040
WAVE = 65536
W = N // WAVE
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)
xs_s = jnp.asarray(xs.reshape(W, WAVE), jnp.int32)
ys_s = jnp.asarray(ys.reshape(W, WAVE), jnp.int32)
al_s = jnp.asarray((perm >= 0).reshape(W, WAVE))

MAXD = 8
S = MAXD + 1


def run(k):
    rad, traced, dropped = whitted_trace_frame(
        cs, env, cam, xs_s, ys_s, al_s, k, MAXD, S,
        backend="pallas", tile=1024, bounce_backend="sparse")
    return rad

rad = run(key)
float(np.asarray(rad[0, 0, 0]))          # warm/compile outside the trace

tdir = "/tmp/jax-trace-whitted"
import shutil
shutil.rmtree(tdir, ignore_errors=True)
with jax.profiler.trace(tdir):
    for i in range(2):
        rad = run(jax.random.fold_in(key, i + 1))
        float(np.asarray(rad[0, 0, i]))

files = sorted(glob.glob(tdir + "/**/*.trace.json.gz", recursive=True))
f = files[-1]
with gzip.open(f, "rt") as fh:
    data = json.load(fh)
evs = [ev for ev in data.get("traceEvents", [])
       if ev.get("ph") == "X" and ev.get("pid") == 3 and ev.get("tid") == 3]
evs.sort(key=lambda e: (e["ts"], -e["dur"]))
self_t = collections.Counter(); cnt = collections.Counter()
stack = []
for ev in evs:
    ts, dur, name = ev["ts"], ev["dur"], ev["name"]
    while stack and ts >= stack[-1][0] + stack[-1][1] - 1e-9:
        stack.pop()
    if stack:
        self_t[stack[-1][2]] -= dur
    self_t[name] += dur; cnt[name] += 1
    stack.append((ts, dur, name))
tot = sum(self_t.values())
print(f"total self {tot/1000:.1f} ms over 2 dispatches", flush=True)
for name, us in self_t.most_common(170):
    print(f"{us/2000:8.3f} ms/frame x{cnt[name]//2:<5d} {name[:110]}",
          flush=True)
