"""Pallas cluster-intersection kernel — the hand-written hot kernel.

The XLA version of the MXU-dense tracer (ops/trace_mxu.py) materializes
the (tile, 4C) matmul output and its decode temporaries to HBM every
cluster step (~0.5GB/step at full wave), and its lockstep loop pays the
slowest tile's cluster count for every tile. This kernel fixes both:

- The wave's (tile, cluster) work queue is *exact*: one grid step per
  overlapping pair, scalar-prefetched as packed ``tile<<16 | cluster``
  ids; a tile with 3 clusters costs 3 steps (no lockstep inflation).
- Matmul + decode + argmin + best-merge all happen in VMEM; HBM sees only
  the cluster blocks (streamed by the Pallas pipeline via
  scalar-prefetched index maps, the embedding-lookup pattern) and one
  final write of each tile's best-hit block (output blocks stay resident
  in VMEM across consecutive steps of the same tile).

The queue is tile-major, every tile is guaranteed at least one item
(cluster 0 is forced into every tile's mask — testing an extra cluster is
conservative-safe because the triangle test itself enforces the t range),
and the tail is padded by repeating the last real item so padded steps
neither re-initialize nor recompute anything.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rayaccel_tpu.environment import Environment, sample_environment_onehot
from rayaccel_tpu.ops.intersect import safe_inv_dir
from rayaccel_tpu.ops.trace_mxu import MxuHits, _INF
from rayaccel_tpu.scene.clusters import ATTR_COLS, RAY_FEATURES, ClusterScene
from rayaccel_tpu.types import Hits, Rays, INVALID_TRIANGLE

_HP = jax.lax.Precision.HIGHEST
# Average overlapping clusters per tile budgeted in the queue (capacity =
# T * ITEMS_PER_TILE); overflow is reported and means dropped far work.
ITEMS_PER_TILE = 48


def _kernel(items_ref, n_ref, F_ref, G_ref, I_ref, A_ref,
            t_out, u_out, v_out, tri_out, attr_out):
    C = I_ref.shape[2]
    tile = F_ref.shape[1]
    i = pl.program_id(0)

    packed = items_ref[i]
    prev = items_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, (packed >> 16) != (prev >> 16))
    live = i < n_ref[0]

    @pl.when(first)
    def _init():
        # Miss state: best_t = per-ray tmax_eff (packed in F col 11).
        t_out[0, 0, :] = F_ref[0, :, 11]
        u_out[0, 0, :] = jnp.zeros((tile,), jnp.float32)
        v_out[0, 0, :] = jnp.zeros((tile,), jnp.float32)
        tri_out[0, 0, :] = jnp.full((tile,), INVALID_TRIANGLE, jnp.int32)
        attr_out[0] = jnp.zeros((tile, ATTR_COLS), jnp.float32)

    @pl.when(live)
    def _step():
        Fm = F_ref[0]                               # (tile, 16)
        S = jax.lax.dot(Fm, G_ref[0], precision=_HP)  # (tile, 4C)
        det = S[:, 0 * C:1 * C]
        u_n = S[:, 1 * C:2 * C]
        v_n = S[:, 2 * C:3 * C]
        t_n = S[:, 3 * C:4 * C]

        sgn = jnp.where(det < 0, -1.0, 1.0)
        ad = jnp.abs(det)
        u = u_n * sgn
        v = v_n * sgn
        t = t_n * sgn
        tmin = Fm[:, 10][:, None]
        best_t = t_out[0, 0][:, None]
        valid = ((ad > 0) & (u >= 0) & (v >= 0) & (u + v <= ad)
                 & (t > ad * tmin) & (t < ad * best_t))
        rcp_ad = 1.0 / jnp.maximum(ad, 1e-30)
        tt = jnp.where(valid, t * rcp_ad, 3e38)

        j = jnp.argmin(tt, axis=1)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (tile, C), 1)
                  == j[:, None])
        tj = jnp.sum(jnp.where(onehot, tt, 0.0), axis=1)
        better = tj < t_out[0, 0]

        sel = onehot & better[:, None]
        uj = jnp.sum(jnp.where(sel, u * rcp_ad, 0.0), axis=1)
        vj = jnp.sum(jnp.where(sel, v * rcp_ad, 0.0), axis=1)
        tri_j = jnp.sum(jnp.where(sel, I_ref[0, 0][None, :], 0), axis=1)
        attr_j = jax.lax.dot(sel.astype(jnp.float32), A_ref[0],
                             precision=_HP)          # (tile, ATTR_COLS)

        t_out[0, 0, :] = jnp.where(better, tj, t_out[0, 0])
        u_out[0, 0, :] = jnp.where(better, uj, u_out[0, 0])
        v_out[0, 0, :] = jnp.where(better, vj, v_out[0, 0])
        tri_out[0, 0, :] = jnp.where(better, tri_j, tri_out[0, 0])
        attr_out[0] = jnp.where(better[:, None], attr_j, attr_out[0])


@partial(jax.jit, static_argnames=("tile", "items_per_tile", "interpret"))
def trace_mxu_pallas(cs: ClusterScene, rays: Rays,
                     env: Environment | None = None,
                     active: jnp.ndarray | None = None, tile: int = 512,
                     items_per_tile: int = ITEMS_PER_TILE,
                     interpret: bool | None = None):
    """Pallas-kernel variant of trace_mxu. Returns (MxuHits, overflow)
    where ``overflow`` counts (tile, cluster) pairs dropped because the
    work queue capacity was exceeded (0 in healthy configurations; rises
    only for extremely incoherent ray tiles)."""
    if interpret is None:  # Mosaic requires hardware; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    R = rays.o.shape[0]
    assert R % tile == 0
    T = R // tile
    C = cs.cluster_size
    n_c = cs.n_clusters

    o = tuple(rays.o[:, a] for a in range(3))
    inv3 = safe_inv_dir(rays.d)
    d = tuple(rays.d[:, a] for a in range(3))
    inv_d = tuple(inv3[:, a] for a in range(3))
    tmin = rays.tmin
    tmax_eff = rays.tmax if active is None else jnp.where(active, rays.tmax, -1.0)

    # ---- dense cull (shared logic with trace_mxu) ----
    t0 = jnp.broadcast_to(tmin[:, None], (R, n_c))
    t1 = jnp.broadcast_to(tmax_eff[:, None], (R, n_c))
    for a in range(3):
        tn = (cs.cl_bbmin[:, a][None, :] - o[a][:, None]) * inv_d[a][:, None]
        tf = (cs.cl_bbmax[:, a][None, :] - o[a][:, None]) * inv_d[a][:, None]
        t0 = jnp.maximum(t0, jnp.minimum(tn, tf))
        t1 = jnp.minimum(t1, jnp.maximum(tn, tf))
    overlap = (t0 <= t1).reshape(T, tile, n_c).any(axis=1)   # (T, N_c)
    overlap = overlap.at[:, 0].set(True)  # every tile has >= 1 item

    # ---- exact work queue, tile-major ----
    cap = T * items_per_tile
    total = jnp.sum(overlap.astype(jnp.int32))
    flat_idx = jnp.nonzero(overlap.reshape(-1), size=cap, fill_value=0)[0]
    n_items = jnp.minimum(total, cap)
    last = flat_idx[jnp.maximum(n_items - 1, 0)]
    lane = jnp.arange(cap)
    flat_idx = jnp.where(lane < n_items, flat_idx, last)
    items = ((flat_idx // n_c).astype(jnp.int32) << 16) \
        | (flat_idx % n_c).astype(jnp.int32)
    overflow = jnp.maximum(total - cap, 0)

    # ---- ray-side features, (T, tile, 16) with tmin/tmax in cols 10/11
    # (G rows 10..15 are zero so the packing is invisible to the dot) ----
    from rayaccel_tpu.ops.trace_mxu import _ray_features
    F = _ray_features(o, d)
    F = F.at[:, 10].set(tmin).at[:, 11].set(tmax_eff).reshape(T, tile,
                                                              RAY_FEATURES)
    G3 = cs.G.reshape(RAY_FEATURES, n_c, 4 * C).transpose(1, 0, 2)
    A3 = cs.attrs.reshape(n_c, C, ATTR_COLS)
    I3 = cs.tri_id.reshape(n_c, 1, C)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((1, tile, RAY_FEATURES),
                         lambda i, items, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, RAY_FEATURES, 4 * C),
                         lambda i, items, n: (items[i] & 0xFFFF, 0, 0)),
            pl.BlockSpec((1, 1, C),
                         lambda i, items, n: (items[i] & 0xFFFF, 0, 0)),
            pl.BlockSpec((1, C, ATTR_COLS),
                         lambda i, items, n: (items[i] & 0xFFFF, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda i, items, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, items, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, items, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, 1, tile), lambda i, items, n: (items[i] >> 16, 0, 0)),
            pl.BlockSpec((1, tile, ATTR_COLS),
                         lambda i, items, n: (items[i] >> 16, 0, 0)),
        ],
    )
    t_o, u_o, v_o, tri_o, attr_o = pl.pallas_call(
        _kernel,
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((T, tile, ATTR_COLS), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(items, n_items[None], F, G3, I3, A3)

    t = t_o.reshape(R)
    u = u_o.reshape(R)
    v = v_o.reshape(R)
    tri = tri_o.reshape(R)
    attr = attr_o.reshape(R, ATTR_COLS)

    hit = tri >= 0
    if env is not None:
        miss_rgb = sample_environment_onehot(env, rays.d)
        mask = hit if active is None else (hit | ~active)
        miss_rgb = jnp.where(mask[:, None], 0.0, miss_rgb)
    else:
        miss_rgb = jnp.zeros((R, 3), jnp.float32)

    hits = Hits(
        tri=jnp.where(hit, tri, INVALID_TRIANGLE),
        t=jnp.where(hit, t, rays.tmax),
        u=u, v=v,
        miss_rgb=miss_rgb,
    )
    return MxuHits(hits=hits, attrs=attr), overflow
