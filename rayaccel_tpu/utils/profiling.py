"""Per-stage device-side profiling (SURVEY.md §5, tracing/profiling row).

The reference measures only wall-clock Mrays/s per frame (main.cpp:208-231);
round-1 perf work needed hand instrumentation to see where a frame goes.
This module times each pipeline stage — primary trace, bounce trace, shade,
regroup, environment sampling — the only way that is trustworthy on a
remote-tunneled TPU: N iterations chained *inside one jit* with a hard
data dependency between iterations, synced by a value readback (a plain
``block_until_ready`` returns before remote execution finishes, and the
relay deduplicates repeated identical dispatches — see docs/PERF_NOTES.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

_SYNC_OVERHEAD_S = None   # calibrated at first use (see _sync_overhead)


def _sync_overhead() -> float:
    """Measure the fixed cost of one dispatch + value readback on THIS
    backend (a remote tunnel pays a ~30ms round trip; direct hardware or
    CPU pays ~nothing). Hard-coding the tunnel constant silently skewed
    every stage number on other backends, so it is timed once per
    process: median of 5 empty-readback round trips."""
    global _SYNC_OVERHEAD_S
    if _SYNC_OVERHEAD_S is None:
        @jax.jit
        def nop(eps):
            return eps + 1.0

        float(np.asarray(nop(jnp.float32(0))))            # compile + warm
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            float(np.asarray(nop(jnp.float32(i + 1))))    # distinct input
            ts.append(time.perf_counter() - t0)
        _SYNC_OVERHEAD_S = float(np.median(ts))
    return _SYNC_OVERHEAD_S


def _timed_loop(fn, args, iters):
    """Time ``fn`` applied ``iters`` times with a chained perturbation so
    nothing is hoisted or deduplicated. Returns seconds per iteration."""

    @jax.jit
    def run(eps, *args):
        def step(i, acc):
            out = fn(acc, *args)
            return jnp.sum(out) * 1e-12 + eps
        return jax.lax.fori_loop(0, iters, step, eps)

    sync = _sync_overhead()
    float(np.asarray(run(jnp.float32(0), *args)))          # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(run(jnp.float32(1e-7), *args)))       # distinct input
    return max(time.perf_counter() - t0 - sync, 0.0) / iters


def profile_stages(renderer, key=None, iters: int = 10) -> dict:
    """Measure per-stage times of one wave of the given PathTracing/Whitted
    renderer. Returns {stage: ms}. Stages: primary_trace, bounce_trace,
    shade, regroup, env_sample."""
    from rayaccel_tpu.camera import generate_pixel_rays
    from rayaccel_tpu.environment import sample_environment_onehot
    from rayaccel_tpu.materials import sample_reflective_diffuse
    from rayaccel_tpu.render.regroup import coherence_key, regroup_state
    from rayaccel_tpu.types import Rays

    key = key if key is not None else jax.random.PRNGKey(0)
    x, y, alive = renderer._wave_inputs[len(renderer._wave_inputs) // 2]
    cam = renderer.camera.as_arrays()
    rays = generate_pixel_rays(cam, x, y, key=key)
    scene = renderer.scene
    env = renderer.environment
    R = x.shape[0]

    def tracer(bk):
        from rayaccel_tpu.ops.trace import trace_bvh
        from rayaccel_tpu.ops.trace_mxu import trace_mxu
        from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
        from rayaccel_tpu.ops.trace_sparse import trace_sparse
        tile = min(renderer.context.configuration.trace_block, R)

        def f(eps, o, d, tmin, tmax, act):
            r = Rays(o, d, tmin + eps, tmax)
            if bk == "xla":
                return trace_bvh(scene, r, active=act).t
            if bk == "pallas":
                return trace_mxu_pallas(scene, r, active=act,
                                        tile=tile)[0].hits.t
            if bk == "sparse":
                return trace_sparse(scene, r, active=act)[0].hits.t
            return trace_mxu(scene, r, active=act, tile=tile).hits.t
        return f

    out = {}
    targs = (rays.o, rays.d, rays.tmin, rays.tmax, alive)
    out["primary_trace_ms"] = _timed_loop(tracer(renderer.backend),
                                          targs, iters) * 1e3
    bounce_bk = getattr(renderer, "bounce_backend", renderer.backend)
    # Bounce-shaped rays: scattered directions from jittered origins.
    kd = jax.random.normal(jax.random.fold_in(key, 1), (R, 3))
    kd = kd / jnp.linalg.norm(kd, axis=-1, keepdims=True)
    brays = Rays(rays.o + rays.d, kd, rays.tmin, rays.tmax)
    bargs = (brays.o, brays.d, brays.tmin, brays.tmax, alive)
    out["bounce_trace_ms"] = _timed_loop(tracer(bounce_bk),
                                         bargs, iters) * 1e3

    mat = jnp.broadcast_to(scene.mat_params[:1], (R, scene.mat_params.shape[1]))
    ns = -rays.d

    def shade(eps, d):
        rnd = jax.random.uniform(jax.random.PRNGKey(3), (R, 3)) + eps
        wi, color, _ = sample_reflective_diffuse(mat, rnd % 1.0, ns, -d)
        return wi + color
    out["shade_ms"] = _timed_loop(shade, (rays.d,), iters) * 1e3

    if hasattr(scene, "cl_bbmin"):
        bmin = jnp.min(scene.cl_bbmin, axis=0)
        binv = 1.0 / jnp.maximum(jnp.max(scene.cl_bbmax, axis=0) - bmin,
                                 1e-20)

        def regroup(eps, o, d, tmin, tmax, act):
            r = Rays(o + eps, d, tmin, tmax)
            ck = coherence_key(r, act, bmin, binv)
            r2, (a2,) = regroup_state(ck, r, [act])
            return r2.o + a2[:, None]
        out["regroup_ms"] = _timed_loop(regroup, targs, iters) * 1e3

    def envs(eps, d):
        return sample_environment_onehot(env, d + eps)
    out["env_sample_ms"] = _timed_loop(envs, (rays.d,), iters) * 1e3
    return {k: round(v, 3) for k, v in out.items()}
