"""k_pairs sweep at frame level (round 5): PT depth-2 with k_pairs=3
(lattice sort + select volume -25% vs k4; round-3 only ever tested k2/k1
with the OLD fixed-width restarts) and Whitted depth-8 with k_pairs=2/3
(mirror children resolve front-to-back faster than diffuse bounces —
88% of rays resolve within the 2 nearest clusters).

Exactness is engine-guaranteed (spill-exact multipass restarts at
k_restart=8); the sweep only moves work between pass 1 and restarts.

Run from repo root on the TPU: timeout 3600 python tools/probe_r5_k.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax

import rayaccel_tpu as racc
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def run(renderer, frames=6):
    s0 = renderer.render_frame(jax.random.PRNGKey(0))
    int(s0.rays_traced)
    keys = [jax.random.PRNGKey(1 + i) for i in range(frames)]
    jax.block_until_ready(keys)
    base = renderer.rays_traced_total
    t0 = time.perf_counter()
    for i in range(frames):
        renderer.render_frame(keys[i])
    rays = renderer.rays_traced_total - base
    dt = time.perf_counter() - t0
    return rays / dt / 1e6, dt / frames * 1e3, renderer.dropped


sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
cam = racc.Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                          sd.viewport_width, sd.viewport_height)


def ctx(k):
    return racc.create_context(racc.Configuration(
        backend="pallas", wave_size=128 * 128 * 4, trace_block=1024,
        sparse_k_pairs=k))


for k in (4, 3):
    sd2 = type(sd)(**{**sd.__dict__, "max_depth": 2})
    r = racc.PathTracingRenderer(ctx(k), cam, sd2, tpu_scene=cs)
    m, ms, dr = run(r)
    emit(config=f"pt2_k{k}", mrays=m, frame_ms=ms, dropped=dr)

for k in (4, 3, 2):
    sd8 = type(sd)(**{**sd.__dict__, "max_depth": 8})
    r = racc.WhittedRenderer(ctx(k), cam, sd8, tpu_scene=cs)
    m, ms, dr = run(r)
    emit(config=f"whitted8_k{k}", mrays=m, frame_ms=ms, dropped=dr)

print("DONE", flush=True)
