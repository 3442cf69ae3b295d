"""sp_tile sweep at frame level (round 5): the pair kernel's decode
volume is items x C x SP = pairs x C + runs x C x SP (DESIGN_50M.md §0)
— the RUNS term scales with SP. At frame width pass-1 (~1.05M pairs,
~0.9k cluster runs), SP=512 cuts total decoded candidates ~23% vs the
default 1024. sp_tile=2048 was falsified round 4 (the other direction:
per-item decode doubles as items halve, runs term doubles); 512 was
never probed. Block-boundary run splits add ~pairs/SP items back —
the sweep measures the net on real frames.

Run from repo root on the TPU: timeout 3600 python tools/probe_r5_sp.py
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


def ctx(sp):
    return racc.create_context(racc.Configuration(
        backend="pallas", wave_size=128 * 128 * 4, trace_block=1024,
        sparse_sp_tile=sp))


for sp in (1024, 512):
    sd2 = type(sd)(**{**sd.__dict__, "max_depth": 2})
    r = racc.PathTracingRenderer(ctx(sp), cam, sd2, tpu_scene=cs)
    m, ms, dr = run(r)
    emit(config=f"pt2_sp{sp}", mrays=m, frame_ms=ms, dropped=dr)

for sp in (1024, 512):
    sd8 = type(sd)(**{**sd.__dict__, "max_depth": 8})
    r = racc.WhittedRenderer(ctx(sp), cam, sd8, tpu_scene=cs)
    m, ms, dr = run(r)
    emit(config=f"whitted8_sp{sp}", mrays=m, frame_ms=ms, dropped=dr)

print("DONE", flush=True)
