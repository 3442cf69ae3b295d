"""Dense-kernel wave-size x tile re-sweep on the post-transpose,
decode-trimmed kernel.

The "superlinear beyond 65k" wave finding (round 2: 262k wave = 21.3ms
vs 4 x 3.54) predates the lane-aligned transposes and the decode trim;
if 131k now scales linearly, the primary scan needs half the waves and
half the per-wave glue. Also re-checks tile=2048 (512 was rejected
pre-transpose; 2048 never tried on the trimmed kernel).

Run from repo root on the TPU: python tools/probe_dense_sweep.py
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
from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)
N = 983040
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)


def emit(**kw):
    print(json.dumps(kw), flush=True)


for wave, tile in ((65536, 1024), (65536, 2048), (131072, 1024),
                   (262144, 1024)):
    x0 = jnp.asarray(xs[:wave], jnp.int32)
    y0 = jnp.asarray(ys[:wave], jnp.int32)
    a0 = jnp.asarray(perm[:wave] >= 0)
    prays = generate_pixel_rays(cam, x0, y0, key=key)

    def f(eps, o, d, tmin, tmax, act):
        rr = Rays(o, d, tmin + eps, tmax)
        res, _ = trace_mxu_pallas(cs, rr, active=act, tile=tile)
        return res.hits.t

    ms = _timed_loop(f, (prays.o, prays.d, prays.tmin, prays.tmax, a0),
                     6) * 1e3
    emit(stage="dense_sweep", wave=wave, tile=tile, ms=round(ms, 3),
         ns_per_ray=round(ms * 1e6 / wave, 2))
