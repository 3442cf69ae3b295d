"""Brute-force reference intersector (test oracle).

Plays the role the Embree CPU path plays in the reference's de-facto
cross-backend oracle (reference Scene.cpp:374-484 + the --no-gpu /
--no-cpu-tracing flag matrix, main.cpp:289-302): an independent
implementation every accelerated backend must agree with. O(R*T) — only
for small scenes in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rayaccel_tpu.ops.intersect import moller_trumbore
from rayaccel_tpu.types import Hits, Rays, INVALID_TRIANGLE


@partial(jax.jit, static_argnames=("chunk",))
def trace_bruteforce(tri_verts: jnp.ndarray, rays: Rays, chunk: int = 512) -> Hits:
    """Closest-hit over all triangles. ``tri_verts``: (T, 3, 3).

    Ties on t are broken toward the lower triangle index, which matches
    a sequential first-wins scan with a strict ``t < best`` update.
    """
    T = tri_verts.shape[0]
    R = rays.o.shape[0]
    pad = (-T) % chunk
    tv = jnp.pad(tri_verts, ((0, pad), (0, 0), (0, 0)))
    n_chunks = (T + pad) // chunk

    def body(carry, tc):
        best_t, best_tri, best_u, best_v, base = carry
        v0 = tc[:, 0][None, :, :]   # (1, C, 3)
        v1 = tc[:, 1][None, :, :]
        v2 = tc[:, 2][None, :, :]
        o = rays.o[:, None, :]
        d = rays.d[:, None, :]
        valid, t, u, v = moller_trumbore(v0, v1, v2, o, d,
                                         rays.tmin[:, None],
                                         rays.tmax[:, None])
        tri_ids = base + jax.lax.broadcasted_iota(jnp.int32, (R, chunk), 1)
        in_range = tri_ids < T
        t = jnp.where(valid & in_range, t, jnp.inf)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(R)
        tj = t[rows, j]
        better = tj < best_t
        best_tri = jnp.where(better, tri_ids[rows, j], best_tri)
        best_u = jnp.where(better, u[rows, j], best_u)
        best_v = jnp.where(better, v[rows, j], best_v)
        best_t = jnp.where(better, tj, best_t)
        return (best_t, best_tri, best_u, best_v, base + chunk), None

    init = (jnp.full((R,), jnp.inf, jnp.float32),
            jnp.full((R,), INVALID_TRIANGLE, jnp.int32),
            jnp.zeros((R,), jnp.float32),
            jnp.zeros((R,), jnp.float32),
            jnp.int32(0))
    (best_t, best_tri, best_u, best_v, _), _ = jax.lax.scan(
        body, init, tv.reshape(n_chunks, chunk, 3, 3))

    miss = best_tri == INVALID_TRIANGLE
    return Hits(
        tri=best_tri,
        t=jnp.where(miss, rays.tmax, best_t),
        u=best_u, v=best_v,
        miss_rgb=jnp.zeros((R, 3), jnp.float32),
    )
