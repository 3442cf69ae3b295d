"""Isolate the Whitted-loop attr-gather mystery: the depth-8 xplane
attributes ~15 ms/iteration at full width to the trace_sparse attr row
gather (trace_sparse.py:820), but the same gather in the PT frame
measured 1.8 ms (round-3 xplane). Difference candidates: the in-loop env
sampling (whitted traces pass env; PT defers it), the surf build, or a
misattributed fusion.

Times trace_sparse at 983k on a real bounce pool: env=None vs env=quad
vs env=onehot, plus the raw attr take + quad gather in isolation.

Run: JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache \
     timeout 2400 python tools/probe_whitted_attr.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.environment import Environment, create_environment
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
env_q = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                           sd.env_pixels.shape[0])
env_oh = Environment(env_q.pixels)
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
key = jax.random.PRNGKey(0)
N = 983040
WAVE = 65536
perm, xs, ys = block_swizzle(sd.viewport_width, sd.viewport_height, N)


def emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


@jax.jit
def make_bounce_wave(x, y, alive0, k):
    rays = generate_pixel_rays(cam, x, y, key=k)
    hits, surf, _ = _trace_and_surface(cs, rays, alive0, "pallas", 1024, 48)
    r2, w2, d2, a2, md, mw = _shade_advance(
        hits, surf, rays, jnp.ones((WAVE, 3)), jnp.zeros((WAVE,), jnp.int32),
        alive0, rays.d, jnp.zeros((WAVE, 3)), jax.random.fold_in(k, 1), 2)
    return r2, a2


os_, ds_, al_ = [], [], []
for w in range(N // WAVE):
    sl = slice(w * WAVE, (w + 1) * WAVE)
    r2, a2 = make_bounce_wave(jnp.asarray(xs[sl], jnp.int32),
                              jnp.asarray(ys[sl], jnp.int32),
                              jnp.asarray(perm[sl] >= 0),
                              jax.random.fold_in(key, w))
    os_.append(r2.o); ds_.append(r2.d); al_.append(a2)

o = jnp.concatenate(os_); d = jnp.concatenate(ds_)
alive = jnp.concatenate(al_)
emit(stage="bounce_pool", n=N, live=int(jnp.sum(alive)))
rays = Rays(o=o, d=d, tmin=jnp.full((N,), 1e-4, jnp.float32),
            tmax=jnp.full((N,), 1e6, jnp.float32))


def t(tag, env):
    def f(eps, o, d, tmin, tmax, act):
        rr = Rays(o, d, tmin + eps, tmax)
        res, ov = trace_sparse(cs, rr, env=env, active=act)
        return res.hits.t + res.hits.miss_rgb[:, 0]
    ms = _timed_loop(f, (rays.o, rays.d, rays.tmin, rays.tmax, alive),
                     4) * 1e3
    emit(stage=tag, ms=ms)


t("sparse_env_none", None)
t("sparse_env_quad", env_q)
t("sparse_env_onehot", env_oh)

# Raw gathers in isolation.
slot = jax.random.randint(jax.random.PRNGKey(3), (N,), 0,
                          cs.attrs.shape[0])


def f_attr(eps, s):
    return jnp.take(cs.attrs, s + (eps > 1e9).astype(jnp.int32),
                    axis=0)[:, 0]

emit(stage="attr_take_983k",
     ms=_timed_loop(f_attr, (slot,), 8) * 1e3)


def f_quad(eps, dd):
    from rayaccel_tpu.environment import sample_environment_onehot
    return sample_environment_onehot(env_q, dd + eps)[:, 0]

emit(stage="env_quad_983k", ms=_timed_loop(f_quad, (d,), 8) * 1e3)
print("DONE", flush=True)
