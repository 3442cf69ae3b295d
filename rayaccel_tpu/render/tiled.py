"""Tiled progressive renderer base.

Analog of the reference TiledRenderer (reference TiledRenderer.h:35-68,
TiledRenderer.cpp:11-77): owns the HDR accumulation framebuffer and walks
the frame in fixed-size tiles. TPU redesign:

- The atomic tile counter becomes a static partition of the frame into
  waves of ``wave_size`` pixels.
- Pixels are *block-swizzled* (32x16 screen blocks): consecutive wave
  lanes form compact screen tiles so the MXU tracer's ray tiles are
  spatially coherent — the wavefront analog of the reference's 128x128
  tile coherence (TiledRenderer.h:37).
- The framebuffer is stored in swizzled lane order and each wave writes
  one contiguous slice. Because a path-tracing/Whitted lane serves
  exactly one pixel, radiance accumulates in per-lane registers and no
  scatter ever touches the framebuffer (the reference instead relies on
  benignly-racy scatter into a shared buffer, SURVEY.md §5; TPU scatters
  cost ~10ns/element, so lane-order accumulation is both deterministic
  AND the fast path). ``image()`` un-permutes on the host once per
  readback.

Subclasses implement :meth:`_build_wave_fn` returning a jitted
``(x, y, alive, key) -> (radiance, rays_traced)`` closure; this inversion
mirrors the reference's spawn/shade callbacks (RayAccelerator.h:89-93)
with the library driving the loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from functools import partial

from jax import shard_map
from jax.sharding import PartitionSpec as P

from rayaccel_tpu.context import Context
from rayaccel_tpu.types import Stats

BLOCK_W = 32
BLOCK_H = 16


def block_swizzle(width: int, height: int, pad_to: int):
    """Flat pixel ids in block-major order, padded with -1 to ``pad_to``.

    Returns (perm, x, y) int32 arrays of length pad_to; padding lanes have
    perm == -1 and x = y = 0.
    """
    bw, bh = BLOCK_W, BLOCK_H
    nbx = -(-width // bw)
    nby = -(-height // bh)
    ys, xs = np.mgrid[0:nby * bh, 0:nbx * bw]
    inside = (xs < width) & (ys < height)
    key = (((ys // bh) * nbx + (xs // bw)).astype(np.int64) * (bw * bh)
           + (ys % bh) * bw + (xs % bw))
    order = np.argsort(key.ravel(), kind="stable")
    xs = xs.ravel()[order]
    ys = ys.ravel()[order]
    inside = inside.ravel()[order]
    n = len(xs)
    assert pad_to >= n
    perm = np.full(pad_to, -1, np.int64)
    x = np.zeros(pad_to, np.int64)
    y = np.zeros(pad_to, np.int64)
    perm[:n] = np.where(inside, ys * width + xs, -1)
    x[:n] = xs
    y[:n] = ys
    return perm, x, y


class TiledRenderer:
    tile_size = 128  # reference TiledRenderer.h:37 (kept for API parity)

    def __init__(self, context: Context, width: int, height: int):
        self.context = context
        self.width = int(width)
        self.height = int(height)
        self.wave_size = context.configuration.wave_size
        self.n_pixels = self.width * self.height

        n_blocks = (-(-self.width // BLOCK_W)) * (-(-self.height // BLOCK_H))
        n_lanes = n_blocks * BLOCK_W * BLOCK_H
        self.n_waves = -(-n_lanes // self.wave_size)
        self.n_lanes = self.n_waves * self.wave_size

        perm, x, y = block_swizzle(self.width, self.height, self.n_lanes)
        self._perm = perm
        self._wave_inputs = []
        for w in range(self.n_waves):
            sl = slice(w * self.wave_size, (w + 1) * self.wave_size)
            self._wave_inputs.append((
                jnp.asarray(x[sl], jnp.int32),
                jnp.asarray(y[sl], jnp.int32),
                jnp.asarray(perm[sl] >= 0),
            ))

        self.spp = 0
        self._dropped_dev = jnp.int32(0)
        self._fb = jnp.zeros((self.n_lanes, 3), jnp.float32)
        self._wave_fn = None  # built lazily by subclass
        self._frame_fn = None
        # Stacked wave inputs for the fused frame loop.
        self._wave_x = jnp.stack([w[0] for w in self._wave_inputs])
        self._wave_y = jnp.stack([w[1] for w in self._wave_inputs])
        self._wave_alive = jnp.stack([w[2] for w in self._wave_inputs])

    @property
    def dropped(self) -> int:
        """Overflow/drop counter (device-accumulated; reading syncs)."""
        return int(self._dropped_dev)

    # -- framebuffer management (TiledRenderer.cpp:51-60) --
    def clear(self):
        self._fb = jnp.zeros((self.n_lanes, 3), jnp.float32)
        self.spp = 0

    @property
    def frame_buffer(self) -> jnp.ndarray:
        """Swizzled lane-order accumulation buffer."""
        return self._fb

    def image(self) -> np.ndarray:
        """Accumulated HDR image divided by spp (DisplayBuffer.cpp:22-74
        does the divide during present). Un-permutes the swizzled buffer."""
        spp = max(self.spp, 1)
        fb = np.asarray(self._fb)
        img = np.zeros((self.n_pixels, 3), np.float32)
        valid = self._perm >= 0
        img[self._perm[valid]] = fb[valid]
        return img.reshape(self.height, self.width, 3) / spp

    # -- frame loop (role of racc::render + cpuWorkerThread spawn path) --
    def render_frame(self, key: jax.Array) -> Stats:
        """Render one progressive sample over the full viewport: the analog
        of one racc::render frame barrier (RayAccelerator.cpp:738-759).

        The whole frame (all waves, all bounces) is ONE compiled call: a
        lax.scan over waves accumulating into the framebuffer — device
        round-trips cost ~30ms on remote-tunnel hosts, so nothing is read
        back per frame; counters stay device-side until queried."""
        if self._wave_fn is None:
            fn = self._build_wave_fn()
            if self.context.mesh is not None:
                fn = self._shard_wave_fn(fn)
            self._wave_fn = fn
        if self._frame_fn is None:
            wave_fn = self._wave_fn
            wave_size = self.wave_size

            @jax.jit
            def frame_fn(fb, xs, ys, alives, key, spp):
                def step(carry, inputs):
                    fb, traced, dropped, w = carry
                    x, y, alive = inputs
                    wave_key = jax.random.fold_in(key, w)
                    radiance, n, d = wave_fn(x, y, alive, wave_key, spp)
                    fb = jax.lax.dynamic_update_slice(
                        fb, jax.lax.dynamic_slice(
                            fb, (w * wave_size, 0), (wave_size, 3)) + radiance,
                        (w * wave_size, 0))
                    return (fb, traced + n, dropped + d, w + 1), None

                init = (fb, jnp.int32(0), jnp.int32(0), jnp.int32(0))
                (fb, traced, dropped, _), _ = jax.lax.scan(
                    step, init, (xs, ys, alives))
                return fb, traced, dropped

            self._frame_fn = frame_fn

        if self.context.mesh is not None:
            # Sharded waves run unfused (shard_map handles the device loop).
            traced = jnp.int32(0)
            dropped = jnp.int32(0)
            for w, (x, y, alive) in enumerate(self._wave_inputs):
                wave_key = jax.random.fold_in(key, w)
                radiance, n, d = self._wave_fn(x, y, alive, wave_key,
                                               jnp.int32(self.spp))
                self._fb = self._fb.at[w * self.wave_size:
                                       (w + 1) * self.wave_size].add(radiance)
                traced = traced + n
                dropped = dropped + d
            self._pending = (traced, dropped)
        else:
            self._fb, traced, dropped = self._frame_fn(
                self._fb, self._wave_x, self._wave_y, self._wave_alive, key,
                jnp.int32(self.spp))
        self.spp += 1
        self._dropped_dev = self._dropped_dev + dropped
        self.end_frame()
        return Stats(rays_traced=traced)

    def _shard_wave_fn(self, inner):
        """Run a wave tile-parallel over the context mesh: rays and lane
        radiance shard over the 'tiles' axis, the scene is replicated (it
        was placed with parallel.mesh.replicate_scene), the ray counters
        psum over ICI — the multi-chip analog of the reference's atomic
        tile counter feeding identical workers (TiledRenderer.cpp:55-67).
        Each chip folds its axis index into the RNG key so samples
        decorrelate across shards."""
        mesh = self.context.mesh

        @jax.jit
        @partial(shard_map, mesh=mesh,
                 in_specs=(P("tiles"), P("tiles"), P("tiles"), P(), P()),
                 out_specs=(P("tiles"), P(), P()),
                 check_vma=False)  # pallas out_shapes carry no vma info
        def fn(x, y, alive, key, spp):
            key = jax.random.fold_in(key, jax.lax.axis_index("tiles"))
            radiance, traced, dropped = inner(x, y, alive, key, spp)
            return (radiance, jax.lax.psum(traced, "tiles"),
                    jax.lax.psum(dropped, "tiles"))

        return fn

    def end_frame(self):
        """Hook mirroring TiledRenderer::endFrame (TiledRenderer.cpp:62-64)."""

    def _build_wave_fn(self):
        raise NotImplementedError
