"""Measure the bench-scale image-RMSE oracle (VERDICT r4 missing #2) on
hardware: production pooled path vs xla reference engine, 320x180
battlefield, depth 2, identical RNG streams. Reports RMSE + wall time so
bench.py's config-7 budget and the gate threshold are data-backed.

Run from repo root: timeout 3600 python tools/probe_image_rmse.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.scene.loader import make_battlefield_like
from tools.oracle_lib import run_image_oracle

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)

for spp in (2, 8):
    t0 = time.perf_counter()
    out = run_image_oracle(cs, sd, n_spp=spp)
    out["seconds"] = round(time.perf_counter() - t0, 1)
    print(json.dumps(out), flush=True)

print("DONE", flush=True)
