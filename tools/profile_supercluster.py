"""Probe the supercluster (SC) level for round 3: per-ray SC overlap on
real bounce rays, and the select kernel's cost when scanning ~104 SC
boxes instead of ~828 clusters."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import types

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.scene.loader import make_battlefield_like
from rayaccel_tpu.scene.clusters import compile_clusters
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_sparse import _select_nearest_pallas
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.render.pathtracer import _shade_advance, _trace_and_surface
from rayaccel_tpu.render.tiled import block_swizzle
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
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
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

# SC boxes: G consecutive clusters per SC.
for G in (4, 8, 16):
    bmin = np.asarray(cs.cl_bbmin)
    bmax = np.asarray(cs.cl_bbmax)
    n_c = bmin.shape[0]
    n_sc = -(-n_c // G)
    pad = n_sc * G - n_c
    bmin_p = np.concatenate([bmin, np.full((pad, 3), 3e37)], axis=0)
    bmax_p = np.concatenate([bmax, np.full((pad, 3), 3e37)], axis=0)
    sc_min = bmin_p.reshape(n_sc, G, 3).min(axis=1)
    sc_max = np.where(
        (bmax_p.reshape(n_sc, G, 3) < 1e37).all(axis=(1, 2))[:, None],
        bmax_p.reshape(n_sc, G, 3).max(axis=1),
        bmax_p.reshape(n_sc, G, 3).min(axis=1))  # padded SCs stay degenerate

    scm = jnp.asarray(sc_min)
    scx = jnp.asarray(sc_max)

    @jax.jit
    def sc_overlap(o, d, alive):
        inv3 = safe_inv_dir(d)
        t0 = jnp.full((o.shape[0], n_sc), 1e-3)
        t1 = jnp.where(alive, 1e6, -1.0)[:, None] * jnp.ones((1, n_sc))
        for a in range(3):
            tn = (scm[:, a][None, :] - o[:, a][:, None]) * inv3[:, a][:, None]
            tf = (scx[:, a][None, :] - o[:, a][:, None]) * inv3[:, a][:, None]
            t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
            t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
        return jnp.sum(t0 <= t1, axis=1)

    cnts = []
    for w in range(N // WAVE):
        sl = slice(w * WAVE, (w + 1) * WAVE)
        cnts.append(np.asarray(sc_overlap(o[sl], d[sl], alive[sl])))
    cnt = np.concatenate(cnts)[np.asarray(alive)]
    emit(stage="sc_overlap", G=G, n_sc=int(n_sc), mean=float(cnt.mean()),
         p50=int(np.percentile(cnt, 50)), p90=int(np.percentile(cnt, 90)),
         p99=int(np.percentile(cnt, 99)), max=int(cnt.max()))

# Select-kernel cost with an SC-sized box set (mock scene object).
G = 8
n_c = cs.cl_bbmin.shape[0]
n_sc = -(-n_c // G)
pad = n_sc * G - n_c
bmin_p = np.concatenate([np.asarray(cs.cl_bbmin),
                         np.full((pad, 3), 3e37)], axis=0)
bmax_p = np.concatenate([np.asarray(cs.cl_bbmax),
                         np.full((pad, 3), 3e37)], axis=0)
mock = types.SimpleNamespace(
    n_clusters=n_sc,
    cl_bbmin=jnp.asarray(bmin_p.reshape(n_sc, G, 3).min(axis=1)),
    cl_bbmax=jnp.asarray(bmax_p.reshape(n_sc, G, 3).max(axis=1)))

tmin = jnp.full((N,), 1e-3)
tmax = jnp.where(alive, 1e6, -1.0)
inv3 = safe_inv_dir(d)


def f_sel(eps, oo, dd):
    ot = tuple(oo[:, a] for a in range(3))
    it = tuple(safe_inv_dir(dd)[:, a] for a in range(3))
    lv, lid, spill, cnt = _select_nearest_pallas(
        mock, ot, it, tmin + eps, tmax, 4, False)
    return lid[0].astype(jnp.float32)


emit(stage="select_sc_frame", ms=_timed_loop(f_sel, (o, d), 4) * 1e3,
     n=N, n_sc=int(n_sc))


def f_sel_full(eps, oo, dd):
    ot = tuple(oo[:, a] for a in range(3))
    it = tuple(safe_inv_dir(dd)[:, a] for a in range(3))
    lv, lid, spill, cnt = _select_nearest_pallas(
        cs, ot, it, tmin + eps, tmax, 4, False)
    return lid[0].astype(jnp.float32)


emit(stage="select_cluster_frame", ms=_timed_loop(
    f_sel_full, (o, d), 4) * 1e3, n=N, n_c=int(n_c))
print("DONE7", flush=True)
