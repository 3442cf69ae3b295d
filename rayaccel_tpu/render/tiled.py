"""Tiled progressive renderer base.

Analog of the reference TiledRenderer (reference TiledRenderer.h:35-68,
TiledRenderer.cpp:11-77): owns the HDR accumulation framebuffer and walks
the frame in fixed-size tiles. On TPU the atomic tile counter becomes a
static partition of the flat pixel array into waves of ``wave_size``
pixels (tile order is irrelevant once spawn/trace/shade are fused into one
compiled wave), and per-thread arenas are unnecessary — XLA owns scratch.

Subclasses implement :meth:`_build_wave_fn` returning a jitted
``(fb, base_pixel, key) -> (fb, rays_traced)`` closure; this inversion
mirrors the reference's spawn/shade callbacks (RayAccelerator.h:89-93) with
the library driving the loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from rayaccel_tpu.context import Context
from rayaccel_tpu.types import Stats


class TiledRenderer:
    tile_size = 128  # reference TiledRenderer.h:37

    def __init__(self, context: Context, width: int, height: int):
        self.context = context
        self.width = int(width)
        self.height = int(height)
        self.wave_size = context.configuration.wave_size
        self.n_pixels = self.width * self.height
        self.n_waves = -(-self.n_pixels // self.wave_size)
        self.spp = 0
        self._fb = jnp.zeros((self.n_pixels, 3), jnp.float32)
        self._wave_fn = None  # built lazily by subclass

    # -- framebuffer management (TiledRenderer.cpp:51-60) --
    def clear(self):
        self._fb = jnp.zeros((self.n_pixels, 3), jnp.float32)
        self.spp = 0

    @property
    def frame_buffer(self) -> jnp.ndarray:
        return self._fb

    def image(self) -> np.ndarray:
        """Accumulated HDR image divided by spp (DisplayBuffer.cpp:22-74
        does the divide during present)."""
        spp = max(self.spp, 1)
        return np.asarray(self._fb).reshape(self.height, self.width, 3) / spp

    # -- frame loop (role of racc::render + cpuWorkerThread spawn path) --
    def render_frame(self, key: jax.Array) -> Stats:
        """Render one progressive sample over the full viewport: the analog
        of one racc::render frame barrier (RayAccelerator.cpp:738-759)."""
        if self._wave_fn is None:
            self._wave_fn = self._build_wave_fn()
        fb = self._fb
        traced = jnp.int64(0) if jax.config.read("jax_enable_x64") else jnp.int32(0)
        for w in range(self.n_waves):
            wave_key = jax.random.fold_in(key, w)
            fb, n = self._wave_fn(fb, jnp.int32(w * self.wave_size), wave_key)
            traced = traced + n
        self._fb = fb
        self.spp += 1
        self.end_frame()
        return Stats(rays_traced=traced)

    def end_frame(self):
        """Hook mirroring TiledRenderer::endFrame (TiledRenderer.cpp:62-64)."""

    def _build_wave_fn(self):
        raise NotImplementedError

    # Helper shared by integrators: flat pixel ids -> (x, y, alive) with
    # padding lanes beyond the framebuffer masked off.
    def _wave_pixels(self, base: jnp.ndarray):
        idx = base + jnp.arange(self.wave_size, dtype=jnp.int32)
        alive = idx < self.n_pixels
        safe = jnp.where(alive, idx, 0)
        x = safe % self.width
        y = safe // self.width
        return safe, x, y, alive
