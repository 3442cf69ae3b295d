"""Wavefront path tracer.

Re-design of the reference PathTracingRenderer (reference
PathTracingRenderer.cpp:53-570) for the TPU execution model. The
reference's scheduler-driven spawn/shade callbacks with material-sorted
8-wide batches become one compiled wave: a ``lax.while_loop`` over bounces
where every iteration traces the surviving rays, accumulates miss
contributions into the framebuffer via scatter-add, and regenerates the
continuation rays in place. Material sorting is unnecessary because BSDF
dispatch is branchless parameter gathering (see rayaccel_tpu.materials);
the framebuffer scatter-add replaces the reference's benign racy
accumulation (SURVEY.md §5) with a deterministic XLA scatter.

Depth is tracked in a separate (R,) array rather than packed into the
pixel id's top byte (PathTracingRenderer.cpp:414) — same semantics, no
bit packing needed when registers are free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.context import Context
from rayaccel_tpu.environment import Environment, create_environment
from rayaccel_tpu.materials import sample_reflective_diffuse
from rayaccel_tpu.ops.trace import trace_bvh
from rayaccel_tpu.render.shading import (interpolate_surface, merge_rays,
                                         spawn_secondary)
from rayaccel_tpu.render.tiled import TiledRenderer
from rayaccel_tpu.scene.compile import TpuScene, compile_scene
from rayaccel_tpu.scene.data import SceneData
from rayaccel_tpu.types import INVALID_TRIANGLE


def pt_shade(scene: TpuScene, rays, hits, weight, key, active):
    """One shading step: the vectorized analog of
    PathTracingRenderer::shade's active-ray path
    (PathTracingRenderer.cpp:133-463). Returns (new_rays, new_weight, ok)."""
    surf = interpolate_surface(scene, rays, hits, active)
    rnd = jax.random.uniform(key, (rays.o.shape[0], 3), jnp.float32)
    wo = -rays.d
    wi, color, transmitted = sample_reflective_diffuse(
        surf.mat_params, rnd, surf.ns, wo)
    new_weight = weight * color
    new_rays, ok = spawn_secondary(surf, wi, new_weight, transmitted,
                                   surf.d_dot_ng)
    return new_rays, new_weight, ok


@partial(jax.jit, static_argnames=("max_depth", "stack_depth"))
def pt_trace_wave(scene: TpuScene, env: Environment, cam_arrays,
                  fb: jnp.ndarray, pixel: jnp.ndarray, x: jnp.ndarray,
                  y: jnp.ndarray, alive0: jnp.ndarray, key: jax.Array,
                  max_depth: int, stack_depth: int = 48):
    """Trace one wave of pixels to completion (all bounces) and accumulate
    into ``fb``. Jittable; shapes static in the wave size.

    Returns (fb, rays_traced).
    """
    R = pixel.shape[0]
    rays = generate_pixel_rays(cam_arrays, x, y, key=jax.random.fold_in(key, 0))
    state = dict(
        rays=rays,
        weight=jnp.ones((R, 3), jnp.float32),
        depth=jnp.zeros((R,), jnp.int32),
        alive=alive0,
        fb=fb,
        traced=jnp.int32(0),
        bounce=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["alive"])

    def body(s):
        rays, alive = s["rays"], s["alive"]
        hits = trace_bvh(scene, rays, env, stack_depth=stack_depth,
                         active=alive)
        traced = s["traced"] + jnp.sum(alive.astype(jnp.int32))

        # Miss => environment contribution (the `contributing` partition,
        # PathTracingRenderer.cpp:465-563).
        miss = alive & (hits.tri == INVALID_TRIANGLE)
        contrib = jnp.where(miss[:, None], s["weight"] * hits.miss_rgb, 0.0)
        fb = s["fb"].at[pixel].add(contrib)

        # Hit & depth budget => continue the path (the `active` partition,
        # PathTracingRenderer.cpp:120-121).
        active = alive & (hits.tri >= 0) & (s["depth"] < max_depth)
        skey = jax.random.fold_in(key, s["bounce"] + 1)
        new_rays, new_weight, ok = pt_shade(scene, rays, hits, s["weight"],
                                            skey, active)
        alive = active & ok
        return dict(
            rays=merge_rays(alive, new_rays, rays),
            weight=jnp.where(alive[:, None], new_weight, s["weight"]),
            depth=s["depth"] + active.astype(jnp.int32),
            alive=alive,
            fb=fb,
            traced=traced,
            bounce=s["bounce"] + 1,
        )

    out = jax.lax.while_loop(cond, body, state)
    return out["fb"], out["traced"]


class PathTracingRenderer(TiledRenderer):
    """Progressive wavefront path tracer over a compiled scene."""

    def __init__(self, context: Context, camera: Camera, scene_data: SceneData,
                 tpu_scene: TpuScene | None = None,
                 environment: Environment | None = None):
        super().__init__(context, scene_data.viewport_width,
                         scene_data.viewport_height)
        self.camera = camera
        self.scene_data = scene_data
        self.scene = tpu_scene if tpu_scene is not None else compile_scene(scene_data)
        if environment is None:
            env_px = scene_data.env_pixels
            assert env_px is not None, "scene has no environment probe"
            environment = create_environment(env_px, env_px.shape[1], env_px.shape[0])
        self.environment = environment
        self.max_depth = int(scene_data.max_depth)

    def _build_wave_fn(self):
        cam_arrays = self.camera.as_arrays()
        scene, env = self.scene, self.environment
        max_depth = self.max_depth
        stack_depth = self.context.configuration.traversal_stack_depth

        def wave_fn(fb, base, key):
            pixel, x, y, alive = self._wave_pixels(base)
            return pt_trace_wave(scene, env, cam_arrays, fb, pixel, x, y,
                                 alive, key, max_depth, stack_depth)

        return wave_fn
