"""Map the whitted depth-8 frame fn's compiled-HLO op names (fusion.N,
branch_K_fun.N, sort.N) to source locations, for reading the xplane
profile (tools/profile_xplane_whitted.py).

Run from repo root on the TPU host (compile cache makes it fast):
  JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
  timeout 1800 python tools/map_whitted_hlo.py fusion.254 fusion.2232 ...
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import re
import sys

import jax
import jax.numpy as jnp

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera
from rayaccel_tpu.render.pathtracer import pt_trace_frame
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.environment import create_environment

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

lowered = pt_trace_frame.lower(
    cs, env, cam, xs_s, ys_s, al_s, jax.random.PRNGKey(0), 2,
    backend="pallas", tile=1024, bounce_backend="sparse")
txt = lowered.compile().as_text()
print(f"HLO text: {len(txt)} bytes", flush=True)

targets = sys.argv[1:]
pat = re.compile(r'%?([a-z_0-9.]+)\s*=.*')
for line in txt.splitlines():
    s = line.strip()
    for t in targets:
        # Definition lines look like: %fusion.254 = ... metadata={...}
        if s.startswith(f"%{t} ") or s.startswith(f"{t} "):
            md = re.search(r'metadata=\{([^}]*)\}', s)
            kind = re.search(r'= *\S+ (\w+)\(', s)
            shape = re.search(r'= *(\S+)', s.split("=", 1)[1])
            print(f"--- {t}")
            print(f"    head: {s[:180]}")
            if md:
                print(f"    meta: {md.group(1)[:300]}")
