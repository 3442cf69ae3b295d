"""Headline benchmark: path tracing the battlefield-like scene, one chip.

Mirrors the reference's figure of merit — Mrays/s with rays counted at
intersection-test dispatch (reference main.cpp:215-231,
RayAccelerator.cpp:200) — on BASELINE.md config 2: PathTracingRenderer,
1280x720, 2 bounces, 1 spp per frame. Prints ONE JSON line.

vs_baseline is measured against the 150 Mrays/s/chip north star
(BASELINE.json; the reference repo publishes no in-repo numbers).
"""

import json
import time

import jax
import numpy as np

import rayaccel_tpu as racc
from rayaccel_tpu.scene.loader import make_battlefield_like

NORTH_STAR_MRAYS = 150.0
FRAMES = 4
MAX_DEPTH = 2


def main():
    import os
    scene_data = make_battlefield_like()
    scene_data.max_depth = MAX_DEPTH
    cfg = racc.Configuration(
        backend=os.environ.get("BENCH_BACKEND", "pallas"),
        wave_size=int(os.environ.get("BENCH_WAVE", 128 * 128 * 4)),
        trace_block=int(os.environ.get("BENCH_TILE", 1024)))
    ctx = racc.create_context(cfg)
    cam = racc.Camera.look_at(
        scene_data.cam_origin, scene_data.cam_dir, scene_data.cam_up,
        scene_data.cam_fov, scene_data.viewport_width,
        scene_data.viewport_height)
    cs = int(os.environ.get("BENCH_CS", 128))
    from rayaccel_tpu.scene.clusters import compile_clusters
    tpu_scene = compile_clusters(scene_data, cluster_size=cs)
    renderer = racc.PathTracingRenderer(ctx, cam, scene_data,
                                        tpu_scene=tpu_scene)
    renderer.backend = cfg.backend

    # Warm-up: compile every wave shape.
    renderer.render_frame(jax.random.PRNGKey(0))
    jax.block_until_ready(renderer.frame_buffer)

    rays = 0
    t0 = time.perf_counter()
    for i in range(FRAMES):
        stats = renderer.render_frame(jax.random.PRNGKey(i + 1))
        rays += int(stats.rays_traced)
    jax.block_until_ready(renderer.frame_buffer)
    dt = time.perf_counter() - t0

    mrays = rays / dt / 1e6
    frame_ms = dt / FRAMES * 1e3
    print(json.dumps({
        "metric": "pt_battlefield_mrays_per_s_per_chip",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
        "frame_ms": round(frame_ms, 2),
        "frames": FRAMES,
        "rays": rays,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
