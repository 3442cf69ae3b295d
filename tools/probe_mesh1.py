"""Pin the mesh=(1,) shard_map tax (VERDICT r4 weak #6 / next #8).

Round-4 rehearsal: 7.42 Mrays/s under the 1-chip shard_map vs 8.98
unsharded — a 17% tax for a no-op mesh. Candidate sources:

  a. the reshard gating compiled IN at n_shards=1 (it should be compiled
     out: do_reshard is False when n_shards == 1),
  b. the shard_map wrapper itself (collective lowering, layout pins),
  c. the per-frame jax.device_put of the framebuffer sharding in
     render_frame (render/tiled.py — only the mesh path does this).

This probe times the production renderer unsharded vs mesh=(1,) on the
same scene. Its first run (round 5) identified (c) as the whole tax —
see the RESOLVED note at the bottom; it now serves as the regression
check that mesh1 stays within ~2% of unsharded.

Run from repo root: timeout 3000 python tools/probe_mesh1.py
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
    return rays / dt / 1e6, dt / frames * 1e3


sd = make_battlefield_like()
sd = type(sd)(**{**sd.__dict__, "max_depth": 2})
cs = compile_clusters(sd, cluster_size=128)
cam = racc.Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                          sd.viewport_width, sd.viewport_height)


def make(mesh_shape):
    ctx = racc.create_context(racc.Configuration(
        backend="pallas", wave_size=128 * 128 * 4, trace_block=1024,
        mesh_shape=mesh_shape))
    return racc.PathTracingRenderer(ctx, cam, sd, tpu_scene=cs)


m, ms = run(make(None))
emit(config="unsharded", mrays=m, frame_ms=ms)

m, ms = run(make((1,)))
emit(config="mesh1", mrays=m, frame_ms=ms)

# RESOLVED (round 5, this probe's first run): unsharded 10.08 Mrays/s
# (155.97 ms), mesh1-as-benched 0.037 (42897 ms — recompile per frame),
# mesh1 with the put hoisted 9.96 (157.86 ms). The ENTIRE tax was the
# per-frame jax.device_put re-shard of the framebuffer in render_frame;
# fixed by pinning the fb's shape+sharding at creation (render/tiled.py
# _make_fb). The two lines above now measure the fixed path and must
# agree within ~2%.

print("DONE", flush=True)
