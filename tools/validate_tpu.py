"""On-TPU cross-engine image validation (VERDICT r1 weak #5).

Renders the battlefield-like scene ON REAL TPU HARDWARE with every
traversal engine and records pairwise image RMSEs — the same visual
cross-engine oracle the reference relies on (Embree vs OpenCL image
agreement via --no-gpu/--no-cpu-tracing, main.cpp:289-302), executed on
the production device instead of the CPU interpreter the test suite uses.

Usage: python tools/validate_tpu.py  (writes docs/ONTPU_VALIDATION.json
and /tmp/validate_<engine>.png)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import rayaccel_tpu as racc
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.utils.image import rmse, tonemap, write_png

SPP = 8
W, H = 320, 180


def main():
    sd = make_battlefield_like()
    sd.viewport_width, sd.viewport_height = W, H
    sd.max_depth = 2
    cs = compile_clusters(sd, cluster_size=128)
    cam = racc.Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up,
                              sd.cam_fov, W, H)

    images = {}
    dropped = {}
    for name, backend, hybrid in (("mxu", "mxu", False),
                                  ("pallas", "pallas", False),
                                  ("sparse", "sparse", False),
                                  ("hybrid", "pallas", True)):
        ctx = racc.create_context(racc.Configuration(
            backend=backend, hybrid_tracing=hybrid, wave_size=16384))
        r = racc.PathTracingRenderer(ctx, cam, sd, tpu_scene=cs)
        for i in range(SPP):
            r.render_frame(jax.random.PRNGKey(i))
        images[name] = r.image()
        dropped[name] = int(r.dropped)
        write_png(f"/tmp/validate_{name}.png", tonemap(images[name], 1))
        print(f"{name}: dropped={dropped[name]}", flush=True)

    names = list(images)
    out = {
        "device": str(jax.devices()[0]),
        "scene": "battlefield-like",
        "viewport": [W, H],
        "spp": SPP,
        "dropped": dropped,
        "rmse": {f"{a}_vs_{b}": round(float(rmse(images[a], images[b])), 6)
                 for i, a in enumerate(names) for b in names[i + 1:]},
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "ONTPU_VALIDATION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
