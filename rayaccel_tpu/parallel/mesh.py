"""Multi-chip tile parallelism over a jax.sharding.Mesh.

The reference is a single-node shared-memory system; its data-parallel
axis is the atomic tile counter feeding persistent workers
(TiledRenderer.cpp:55-67, SURVEY.md §2d). The TPU equivalent shards the
*wave axis* (pixels/rays) across chips with ``shard_map``: the scene is
replicated (it is read-only, mirroring the reference's single shared
scene), every chip traces and shades its own pixel range, and the
framebuffer is reassembled with an all-gather over ICI — there is no
cross-chip traffic during a wave because rays never need other chips'
pixels.

Framebuffer scatter-adds stay chip-local: bounce rays inherit their
pixel id, which belongs to the local shard by construction, so the
all-gather at the end of a frame is the only collective (BASELINE.md
config 5: "replicated scene + tile allgather").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def make_mesh(devices=None, axis: str = "tiles") -> Mesh:
    devices = list(devices) if devices is not None else list(jax.devices())
    return Mesh(np.asarray(devices), (axis,))


def sharded_wave(mesh: Mesh, wave_fn, n_pixels: int):
    """Wrap a single-chip wave function for tile-parallel execution.

    ``wave_fn(fb_local, base_pixel, key) -> (fb_local, traced)`` must treat
    pixel ids relative to its local framebuffer shard. Returns
    ``run(fb, bases, keys) -> (fb, traced_total)`` where ``fb`` is the full
    (n_pixels, 3) framebuffer, ``bases``/``keys`` hold one entry per chip.
    """
    n_dev = mesh.devices.size
    assert n_pixels % n_dev == 0

    @partial(shard_map, mesh=mesh,
             in_specs=(P("tiles"), P("tiles"), P("tiles")),
             out_specs=(P("tiles"), P()))
    def run(fb_shard, base, key):
        fb_shard, traced = wave_fn(fb_shard, base[0], key[0])
        return fb_shard, jax.lax.psum(traced[None], "tiles")

    return run


def replicate_scene(mesh: Mesh, tree):
    """Place a compiled scene replicated on every chip of the mesh
    (the multi-chip analog of the per-device CL_MEM_COPY_HOST_PTR scene
    uploads, Scene.cpp:341-346)."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
