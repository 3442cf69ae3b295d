"""BASELINE config 4's actual target, demonstrated once (VERDICT r4
weak #4): a 256-spp progressive run with RMSE-vs-spp recorded, at reduced
resolution (320x180 battlefield, depth 2).

Ground truth is an independent 2048-spp uniform-jitter render (unbiased,
decorrelated keys). The stratified sampler is the progressive R2
low-discrepancy sequence with per-pixel Cranley-Patterson rotation
(render/pathtracer._primary_rays); its RMSE-vs-spp curve should sit below
the uniform sampler's ~1/sqrt(spp) at equal spp.

Run from repo root: timeout 3600 python tools/probe_spp_convergence.py
Writes docs/SPP_CONVERGENCE.md-ready JSON lines.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import numpy as np

import rayaccel_tpu as racc
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like

W, H = 320, 180
sd = make_battlefield_like(viewport=(W, H))
sd = type(sd)(**{**sd.__dict__, "max_depth": 2})
cs = compile_clusters(sd, cluster_size=128)
cam = racc.Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                          W, H)


def make(sampler):
    ctx = racc.create_context(racc.Configuration(
        backend="pallas", wave_size=61440, trace_block=1024,
        sampler=sampler))
    return racc.PathTracingRenderer(ctx, cam, sd, tpu_scene=cs)


# Ground truth: 2048 spp uniform, keys disjoint from the runs below.
ref = make("uniform")
t0 = time.perf_counter()
REF_SPP = 2048
for i in range(REF_SPP):
    ref.render_frame(jax.random.PRNGKey(1 << 20 | i))
img_ref = ref.image()
print(json.dumps({"stage": "reference", "spp": REF_SPP,
                  "seconds": round(time.perf_counter() - t0, 1)}),
      flush=True)

checkpoints = [1, 2, 4, 8, 16, 32, 64, 128, 256]
for sampler in ("stratified", "uniform"):
    r = make(sampler)
    curve = []
    t0 = time.perf_counter()
    for i in range(256):
        r.render_frame(jax.random.PRNGKey(i))
        if i + 1 in checkpoints:
            d = r.image() - img_ref
            curve.append((i + 1, float(np.sqrt(np.mean(d * d)))))
    print(json.dumps({
        "stage": "curve", "sampler": sampler,
        "rmse_vs_spp": [[s, round(v, 6)] for s, v in curve],
        "seconds": round(time.perf_counter() - t0, 1),
    }), flush=True)

print("DONE", flush=True)
