"""Decompose the pooled PT frame into measured stage costs on real TPU.

Every stage is timed with utils.profiling's chained-iteration pattern
(defeats relay dedup + async readback). One run, ~all the numbers that
matter for the next optimization step. Prints JSON lines.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
from rayaccel_tpu.ops.trace_mxu import trace_mxu
from rayaccel_tpu.render.regroup import coherence_key, regroup_state
from rayaccel_tpu.environment import (create_environment,
                                      sample_environment_onehot)
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
env = create_environment(sd.env_pixels, sd.env_pixels.shape[1],
                         sd.env_pixels.shape[0])

key = jax.random.PRNGKey(0)
N = 983040


def rays_at(n, scattered, live_frac=1.0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    lo = jnp.min(cs.cl_bbmin, axis=0)
    hi = jnp.max(cs.cl_bbmax, axis=0)
    if scattered:
        o = jax.random.uniform(k1, (n, 3)) * (hi - lo) * 0.6 + lo + 0.2 * (hi - lo)
        d = jax.random.normal(k2, (n, 3))
    else:
        o = jnp.broadcast_to((lo + hi) * 0.5 + jnp.array([0., 0., 2.]), (n, 3))
        t = jnp.linspace(-0.3, 0.3, n)
        d = jnp.stack([t, jnp.full((n,), -0.2), -jnp.ones((n,))], axis=1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    alive = jnp.arange(n) < int(n * live_frac)
    return Rays(o=o.astype(jnp.float32), d=d.astype(jnp.float32),
                tmin=jnp.full((n,), 1e-3, jnp.float32),
                tmax=jnp.full((n,), 1e6, jnp.float32)), alive


def emit(name, ms, **kw):
    print(json.dumps({"stage": name, "ms": round(ms, 3), **kw}), flush=True)


def t_trace(fn_name, fn, n, scattered, iters=8, **kw):
    r, alive = rays_at(n, scattered)

    def f(eps, o, d, tmin, tmax, act):
        rr = Rays(o, d, tmin + eps, tmax)
        out = fn(cs, rr, active=act, **kw)
        if isinstance(out, tuple):
            return out[0].hits.t
        return out.hits.t

    ms = _timed_loop(f, (r.o, r.d, r.tmin, r.tmax, alive), iters) * 1e3
    emit(fn_name, ms, n=n, scattered=scattered, **{k: str(v) for k, v in kw.items()})


# 1. primary dense engine at wave size
t_trace("pallas_primary", trace_mxu_pallas, 65536, False, tile=1024)
# 2. sparse bounce engine scaling curve (full live, scattered)
for n in (61440, 245760, 491520):
    t_trace("sparse_bounce", trace_sparse, n, True, iters=4)
# 2b. sparse with the shootout's k6/b3 economy settings
t_trace("sparse_bounce_k6b3", trace_sparse, 245760, True, iters=4,
        k_pairs=6, pair_budget=3)
# 2c. sparse on coherent rays (could it serve primaries?)
t_trace("sparse_coherent", trace_sparse, 65536, False, iters=4)

# 3. regroup at frame size (21 columns like the pooled loop)
r, alive = rays_at(N, True)
bmin = jnp.min(cs.cl_bbmin, axis=0)
binv = 1.0 / jnp.maximum(jnp.max(cs.cl_bbmax, axis=0) - bmin, 1e-20)
cols_proto = [jnp.zeros((N, 3), jnp.float32), jnp.zeros((N,), jnp.int32),
              alive, jnp.arange(N, dtype=jnp.int32),
              jnp.zeros((N, 3), jnp.float32), jnp.zeros((N, 3), jnp.float32)]


def f_regroup(eps, o, d, tmin, tmax, act):
    rr = Rays(o + eps, d, tmin, tmax)
    kk = coherence_key(rr, act, bmin, binv)
    rr2, cols = regroup_state(kk, rr, cols_proto)
    return rr2.o[:, 0] + cols[1].astype(jnp.float32)


emit("regroup_frame", _timed_loop(
    f_regroup, (r.o, r.d, r.tmin, r.tmax, alive), 8) * 1e3, n=N)

# 4. env onehot at frame size
def f_env(eps, d):
    return sample_environment_onehot(env, d + eps)

emit("env_onehot_frame", _timed_loop(f_env, (r.d,), 8) * 1e3, n=N)

# 5. unsort (4-operand sort) at frame size
lane = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))

def f_unsort(eps, rad):
    _, a, b, c = jax.lax.sort((lane, rad[:, 0] + eps, rad[:, 1], rad[:, 2]),
                              num_keys=1)
    return a + b + c

emit("unsort_frame", _timed_loop(f_unsort, (r.o,), 8) * 1e3, n=N)

# 6. shade at wave + frame size
from rayaccel_tpu.materials import sample_reflective_diffuse
for n in (65536, 491520):
    mat = jnp.broadcast_to(cs.mat_params[:1], (n, cs.mat_params.shape[1]))
    dd = jax.random.normal(key, (n, 3))
    dd = dd / jnp.linalg.norm(dd, axis=-1, keepdims=True)

    def f_shade(eps, d):
        rnd = (jax.random.uniform(jax.random.PRNGKey(3), (n, 3)) + eps) % 1.0
        wi, color, _ = sample_reflective_diffuse(mat, rnd, d, -d)
        return wi + color

    emit("shade", _timed_loop(f_shade, (dd,), 8) * 1e3, n=n)

# 7. gather width study: rows/s at widths 16/32/48
src = jax.random.normal(key, (106000, 48))
idx = jax.random.randint(key, (262144,), 0, 106000)
for w in (16, 32, 48):
    s = src[:, :w]

    def f_gather(eps, ii):
        return jnp.take(s, ii, axis=0)[:, 0] + eps

    emit("gather_rows", _timed_loop(f_gather, (idx,), 8) * 1e3,
         rows=262144, width=w)

# 8. primary ray gen at wave size
from rayaccel_tpu.camera import Camera, generate_pixel_rays
cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                     sd.viewport_width, sd.viewport_height).as_arrays()
x = jnp.tile(jnp.arange(1024, dtype=jnp.int32), 64)
y = jnp.repeat(jnp.arange(64, dtype=jnp.int32), 1024)

def f_gen(eps, xx):
    rr = generate_pixel_rays(cam, xx, y, key=jax.random.PRNGKey(1))
    return rr.d[:, 0] + eps

emit("primary_gen", _timed_loop(f_gen, (x,), 8) * 1e3, n=65536)
print("DONE", flush=True)
