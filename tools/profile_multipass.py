"""Measure the multipass sparse engine at frame width on REAL bounce rays,
plus permutation-move micro-costs. Decides the pass-2 compaction design."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
from rayaccel_tpu.types import Rays
from rayaccel_tpu.utils.profiling import _timed_loop

sd = make_battlefield_like()
cs = compile_clusters(sd, cluster_size=128)
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
emit(stage="pop", live=int(jnp.sum(alive)))

rays_n = Rays(o, d, jnp.full((N,), 1e-3), jnp.full((N,), 1e6))

# 1. full-frame bounce trace cost vs pass cap
for mp in (1, 2, 4):
    res, ovf = jax.jit(lambda r, a: trace_sparse(
        cs, r, active=a, max_passes=mp))(rays_n, alive)
    unresolved = int(ovf)

    def f(eps, oo, dd, act):
        r = Rays(oo, dd, jnp.full((N,), 1e-3) + eps, jnp.full((N,), 1e6))
        return trace_sparse(cs, r, active=act, max_passes=mp)[0].hits.t

    ms = _timed_loop(f, (o, d, alive), 3) * 1e3
    emit(stage="sparse_frame_real", max_passes=mp, ms=ms, overflow=unresolved)

# 2. permutation-move micro-costs at frame width
P20 = jax.random.normal(key, (N, 20))
pidx = jax.random.permutation(key, jnp.arange(N, dtype=jnp.int32))
for w in (8, 20):
    Pw = P20[:, :w]

    def f_take(eps, ii):
        return jnp.take(Pw, ii, axis=0)[:, 0] + eps

    emit(stage="take_perm", width=w,
         ms=_timed_loop(f_take, (pidx,), 6) * 1e3)

kk = jax.random.randint(key, (N,), 0, 1 << 18)
iota = jnp.arange(N, dtype=jnp.int32)

def f_sort2(eps, k2):
    return jax.lax.sort((k2 + eps.astype(jnp.int32), iota),
                        num_keys=1)[1]

emit(stage="sort2op", ms=_timed_loop(
    lambda eps, k2: f_sort2(eps, k2).astype(jnp.float32), (kk,), 6) * 1e3)

# 3. scatter-min at pair scale
MP = 1966080
packed = jax.random.randint(key, (MP,), 0, 1 << 30)
sray = jax.random.randint(key, (MP,), 0, N)

def f_smin(eps, pk):
    best = jnp.full((N,), jnp.int32(0x7F000000))
    return best.at[sray].min(pk + eps.astype(jnp.int32)).astype(jnp.float32)

emit(stage="scatter_min_pairs", mp=MP,
     ms=_timed_loop(f_smin, (packed,), 4) * 1e3)

# 4. gather at pair scale (the F-row fetch)
F = jax.random.normal(key, (N, 16))
gidx = jax.random.randint(key, (MP,), 0, N)

def f_g(eps, ii):
    return jnp.take(F, ii, axis=0)[:, 0] + eps

emit(stage="gather_pairs", mp=MP, ms=_timed_loop(f_g, (gidx,), 4) * 1e3)

# 5. 3-operand lattice flatten sort at K*N
KR = 6 * N
lk = jax.random.randint(key, (KR,), 0, 1 << 16)
lr = jnp.tile(iota, 6)
lrk = jnp.repeat(jnp.arange(6, dtype=jnp.int32), N)

def f_lat(eps, a):
    x1, x2, x3 = jax.lax.sort((a + eps.astype(jnp.int32), lr, lrk),
                              num_keys=1)
    return (x1 + x2 + x3).astype(jnp.float32)

emit(stage="lattice_sort", kr=KR, ms=_timed_loop(f_lat, (lk,), 4) * 1e3)
print("DONE4", flush=True)
