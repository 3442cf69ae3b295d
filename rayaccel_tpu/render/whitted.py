"""Wavefront Whitted renderer: ray *trees* on a streaming engine.

Re-design of the reference WhittedRenderer (reference
WhittedRenderer.cpp:38-697). The reference bounds ray-tree fan-out with a
global mutex-protected LoopData pool: when a hit spawns both a reflection
and a refraction ray, the reflection continues in the output stream and
the refraction is *parked*, linked onto the continuation's head chain
(WhittedRenderer.cpp:119-133); when a path terminates, one parked ray per
terminated head is resurrected (WhittedRenderer.cpp:91-115).

On TPU each wavefront lane owns exactly one pixel's whole ray tree, so
the linked-list pool collapses into a *lane-local stack*: parking pushes
the refraction ray, termination pops it — a classic depth-first binary
tree traversal, no mutex, no links. The pool-size bound (maxShadingDepth=8
entries per in-flight ray, WhittedRenderer.cpp:47-50) becomes the stack
depth; the frame-end pool-drained assert (WhittedRenderer.cpp:62) becomes
"every lane finished with an empty stack", which holds by construction,
plus an overflow counter the tests require to be zero.

Shading is the reference's inline headlight model
(WhittedRenderer.cpp:343-372): gray 0.3 albedo, directional light
(0.57, 0.57, 0.57), fixed eta 1.1 glass for refraction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.context import Context
from rayaccel_tpu.environment import Environment, create_environment
from rayaccel_tpu.ops.trace import trace_bvh
from rayaccel_tpu.ops.trace_mxu import trace_mxu
from rayaccel_tpu.render.shading import (ORIGIN_EPSILON, SECONDARY_TMAX,
                                         SECONDARY_TMIN, WEIGHT_CUTOFF,
                                         interpolate_surface, merge_rays,
                                         surface_from_attrs)
from rayaccel_tpu.render.tiled import TiledRenderer
from rayaccel_tpu.scene.clusters import ClusterScene, compile_clusters
from rayaccel_tpu.scene.compile import TpuScene, compile_scene
from rayaccel_tpu.scene.data import SceneData
from rayaccel_tpu.types import INVALID_TRIANGLE, Rays

MATERIAL_GRAY = 0.3                      # WhittedRenderer.cpp:343-345
LIGHT_DIR = (0.57, 0.57, 0.57)           # WhittedRenderer.cpp:357-359
ETA_GLASS = 1.1                          # WhittedRenderer.cpp:429-430


def whitted_shade(surf, rays: Rays, weight):
    """Compute direct radiance + both child rays for active hits, given a
    shading frame (from gathers or from the MXU tracer's attribute rows).

    Vectorized analog of WhittedRenderer::shade's 8-wide block
    (WhittedRenderer.cpp:203-581). Returns
    (radiance, new_weight, refl_rays, refl_ok, refr_rays, refr_ok).
    """
    d = rays.d
    ns = surf.ns  # already flipped toward the incoming ray

    light = jnp.asarray(LIGHT_DIR, jnp.float32)
    ndotl = jnp.maximum(jnp.sum(ns * light[None, :], axis=-1), 0.0)
    new_weight = weight * MATERIAL_GRAY
    radiance = new_weight * ndotl[:, None]

    cont = jnp.any(new_weight > WEIGHT_CUTOFF, axis=-1)  # :407-411

    d_dot_n = jnp.sum(d * ns, axis=-1)

    # Reflection (:420-424).
    refl_d = d - (2.0 * d_dot_n)[:, None] * ns

    # Refraction (:428-442); eta by travel side (outward-normal convention:
    # entering uses 1/1.1).
    eta = jnp.where(surf.entering, 1.0 / ETA_GLASS, ETA_GLASS)
    r = 1.0 - eta * eta * (1.0 - d_dot_n * d_dot_n)
    mu = eta * d_dot_n + jnp.sqrt(jnp.maximum(r, 0.0))
    refr_d = eta[:, None] * d - mu[:, None] * ns

    d_side = surf.d_dot_ng > 0

    def finish(dir_new, extra_ok):
        dot = jnp.sum(dir_new * surf.ng, axis=-1)
        pos = surf.pos + surf.ng * (
            ORIGIN_EPSILON * jnp.where(dot >= 0, 1.0, -1.0))[:, None]
        finite = (jnp.all(jnp.isfinite(pos), axis=-1)
                  & jnp.all(jnp.isfinite(dir_new), axis=-1))
        n = dir_new.shape[0]
        out = Rays(pos, dir_new,
                   jnp.full((n,), SECONDARY_TMIN, jnp.float32),
                   jnp.full((n,), SECONDARY_TMAX, jnp.float32))
        return out, cont & extra_ok & finite, dot > 0

    refl_rays, refl_base, refl_side = finish(refl_d, jnp.ones_like(cont))
    refr_rays, refr_base, refr_side = finish(refr_d, r > 0.0)
    # Side consistency (:445-449): reflection leaves on the opposite side
    # of Ng, refraction on the same side.
    refl_ok = refl_base & (refl_side != d_side)
    refr_ok = refr_base & (refr_side == d_side)
    return radiance, new_weight, refl_rays, refl_ok, refr_rays, refr_ok


@partial(jax.jit, static_argnames=("max_depth", "stack_size", "backend",
                                   "tile", "stack_depth", "shadows",
                                   "bounce_backend", "primary_only",
                                   "regroup"))
def whitted_trace_wave(scene, env: Environment, cam_arrays,
                       x: jnp.ndarray, y: jnp.ndarray, alive0: jnp.ndarray,
                       key: jax.Array, max_depth: int, stack_size: int = 9,
                       backend: str = "mxu", tile: int = 512,
                       stack_depth: int = 48, shadows: bool = False,
                       bounce_backend: str | None = None,
                       primary_only: bool = False, regroup: bool = True):
    """Trace one wave of pixels through their full Whitted ray trees.

    Returns (radiance, rays_traced, dropped): per-lane accumulated
    radiance; ``dropped`` counts refraction rays lost to parked-stack
    overflow (must be 0 when stack_size > max_depth — the analog of the
    reference's pool-drained invariant, WhittedRenderer.cpp:62).

    The parked-ray stacks live transposed, (stack_size, R), so pushes and
    pops are one-hot level blends over packed lanes (see ops/trace.py on
    why (R, S) scatter layouts are slow on TPU).
    """
    R = x.shape[0]
    if bounce_backend is None:
        bounce_backend = backend
    rays = generate_pixel_rays(cam_arrays, x, y, key=key)
    level = jax.lax.broadcasted_iota(jnp.int32, (stack_size, R), 0)
    # Regrouping pays a wide multi-column state move per bounce; with
    # primary_only (BASELINE config 1) no bounce ever follows the first
    # shade, so the move would be pure waste (~8ms/wave measured).
    do_regroup = (regroup and not primary_only
                  and backend != "xla" and bounce_backend != "xla")
    if do_regroup:
        from rayaccel_tpu.render.regroup import coherence_key, regroup_state
        bmin = jnp.min(scene.cl_bbmin, axis=0)
        binv = 1.0 / jnp.maximum(
            jnp.max(scene.cl_bbmax, axis=0) - bmin, 1e-20)

    def trace_and_surface(rays, alive, bk):
        if bk == "xla":
            hits = trace_bvh(scene, rays, env=env, active=alive,
                             stack_depth=stack_depth)
            surf = interpolate_surface(scene, rays, hits,
                                       alive & (hits.tri >= 0))
            return hits, surf
        if bk == "pallas":
            from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
            res, _ = trace_mxu_pallas(scene, rays, env=env, active=alive,
                                      tile=tile)
        elif bk == "sparse":
            from rayaccel_tpu.ops.trace_sparse import trace_sparse
            res, _ = trace_sparse(scene, rays, env=env, active=alive)
        else:
            res = trace_mxu(scene, rays, env=env, active=alive, tile=tile)
        surf = surface_from_attrs(res.attrs, scene.mat_params, rays,
                                  res.hits)
        return res.hits, surf

    # Carry inits derive from ray/pixel inputs (shard_map varying-axes).
    zf = rays.tmax * 0.0
    state = dict(
        rays=rays,
        weight=jnp.ones_like(rays.o),
        depth=x * 0,
        alive=alive0,
        sp=x * 0,
        stk=jnp.broadcast_to(zf[None, None, :],
                             (stack_size, 7, R)),  # o(3) d(3) depth(1)
        stk_w=jnp.broadcast_to(zf[None, None, :], (stack_size, 3, R)),
        radiance=rays.o * 0.0,
        lane=x * 0 + jnp.arange(R, dtype=jnp.int32),
        traced=jnp.sum(x) * 0,
        dropped=jnp.sum(x) * 0,
    )

    # Live-prefix buckets for the bounce traces (see pathtracer.py): the
    # regroup sorts dead lanes last, so only the smallest compiled prefix
    # covering the live count is traced.
    sizes = [s for s in (R // 4, R // 2)
             if s >= tile and s % tile == 0] + [R]

    def traced_prefix(rays, alive, bk):
        from rayaccel_tpu.types import Hits
        n_live = jnp.sum(alive.astype(jnp.int32))

        def make_branch(size):
            def branch(rays, alive):
                sub = Rays(rays.o[:size], rays.d[:size],
                           rays.tmin[:size], rays.tmax[:size])
                hits, surf = trace_and_surface(sub, alive[:size], bk)
                if size == R:
                    return hits, surf
                pad = R - size

                def tail(xx, fill=0):
                    widths = ((0, pad),) + ((0, 0),) * (xx.ndim - 1)
                    return jnp.pad(xx, widths, constant_values=fill)

                hits = Hits(tri=tail(hits.tri, INVALID_TRIANGLE),
                            t=tail(hits.t), u=tail(hits.u), v=tail(hits.v),
                            miss_rgb=tail(hits.miss_rgb))
                return hits, jax.tree.map(tail, surf)
            return branch

        idx = sum((n_live > s).astype(jnp.int32) for s in sizes[:-1])
        return jax.lax.switch(idx, [make_branch(s) for s in sizes],
                              rays, alive)

    def cond(s):
        return jnp.any(s["alive"])

    def body(s, bk, use_prefix=False):
        rays, alive, weight = s["rays"], s["alive"], s["weight"]
        if use_prefix:
            hits, surf = traced_prefix(rays, alive, bk)
        else:
            hits, surf = trace_and_surface(rays, alive, bk)
        traced = s["traced"] + jnp.sum(alive.astype(jnp.int32))

        radiance = s["radiance"]
        # Miss => environment (WhittedRenderer.cpp:586-680); env radiance is
        # folded into the trace result (Result union contract).
        miss = alive & (hits.tri == INVALID_TRIANGLE)
        radiance = radiance + jnp.where(miss[:, None],
                                        weight * hits.miss_rgb, 0.0)

        # Active hits: direct light + children (hits at depth == max_depth
        # terminate without contribution, WhittedRenderer.cpp:171-187).
        active = alive & (hits.tri >= 0) & (s["depth"] < max_depth)
        direct, new_w, refl, refl_ok, refr, refr_ok = whitted_shade(
            surf, rays, weight)
        if primary_only:
            # BASELINE config 1: primary + shadow rays only — no
            # reflection/refraction trees.
            refl_ok = refl_ok & False
            refr_ok = refr_ok & False
        refl_ok = refl_ok & active
        refr_ok = refr_ok & active
        if shadows:
            # Shadow rays toward the directional light (BASELINE config 1:
            # primary+shadow): direct light is masked by an any-hit
            # occlusion query from the offset hit point.
            light = jnp.asarray(LIGHT_DIR, jnp.float32)
            light = light / jnp.linalg.norm(light)
            sgn = jnp.where(jnp.sum(surf.ng * light[None, :], axis=-1) >= 0,
                            1.0, -1.0)
            spos = surf.pos + surf.ng * (ORIGIN_EPSILON * sgn)[:, None]
            srays = Rays(o=spos,
                         d=jnp.broadcast_to(light[None, :], spos.shape) + spos * 0.0,
                         tmin=SECONDARY_TMIN + spos[:, 0] * 0.0,
                         tmax=SECONDARY_TMAX + spos[:, 0] * 0.0)
            if bk == "pallas":
                from rayaccel_tpu.ops.trace_pallas import (
                    trace_occlusion_pallas)
                occluded = trace_occlusion_pallas(scene, srays, active=active,
                                                  tile=tile)
            elif bk in ("mxu", "sparse"):
                from rayaccel_tpu.ops.trace_mxu import trace_occlusion_mxu
                occluded = trace_occlusion_mxu(scene, srays, active=active,
                                               tile=tile)
            else:
                from rayaccel_tpu.ops.trace import trace_occlusion_bvh
                occluded = trace_occlusion_bvh(scene, srays, active=active,
                                               stack_depth=stack_depth)
            traced = traced + jnp.sum(active.astype(jnp.int32))
            direct = jnp.where(occluded[:, None], 0.0, direct)
        radiance = radiance + jnp.where(active[:, None], direct, 0.0)

        # Continuation selection (WhittedRenderer.cpp:535-565): reflection
        # continues; lone refraction continues; both => park refraction.
        next_rays = merge_rays(refl_ok, refl, refr)
        has_next = refl_ok | refr_ok
        park = refl_ok & refr_ok

        sp = s["sp"]
        can_park = park & (sp < stack_size)
        dropped = s["dropped"] + jnp.sum((park & ~can_park).astype(jnp.int32))
        push_mask = (level == sp[None, :]) & can_park[None, :]
        entry = jnp.stack([refr.o[:, 0], refr.o[:, 1], refr.o[:, 2],
                           refr.d[:, 0], refr.d[:, 1], refr.d[:, 2],
                           (s["depth"] + 1).astype(jnp.float32)])  # (7, R)
        stk = jnp.where(push_mask[:, None, :], entry[None, :, :], s["stk"])
        stk_w = jnp.where(push_mask[:, None, :], new_w.T[None, :, :],
                          s["stk_w"])
        sp = sp + can_park.astype(jnp.int32)

        # Termination => resurrect a parked ray (loopHandling,
        # WhittedRenderer.cpp:91-115), else the lane dies.
        terminated = alive & ~has_next
        pop = terminated & (sp > 0)
        sp = sp - pop.astype(jnp.int32)
        pop_mask = (level == sp[None, :]) & pop[None, :]
        pe = jnp.sum(jnp.where(pop_mask[:, None, :], stk, 0.0), axis=0)  # (7,R)
        pw = jnp.sum(jnp.where(pop_mask[:, None, :], stk_w, 0.0), axis=0)
        popped = Rays(
            o=pe[0:3].T, d=pe[3:6].T,
            tmin=jnp.full((R,), SECONDARY_TMIN, jnp.float32),
            tmax=jnp.full((R,), SECONDARY_TMAX, jnp.float32))

        alive_next = (active & has_next) | pop
        out_rays = merge_rays(pop, popped, merge_rays(has_next, next_rays, rays))
        out_w = jnp.where(pop[:, None], pw.T,
                          jnp.where(active[:, None], new_w, weight))
        out_depth = jnp.where(pop, pe[6].astype(jnp.int32),
                              s["depth"] + active.astype(jnp.int32))
        lane = s["lane"]

        if do_regroup:
            # Between-bounce regroup (the PT regroup extended to ray
            # trees): the parked-ray stacks flatten into per-lane columns
            # and ride the same multi-operand sort as the lane state, so
            # a lane's pending subtree moves with it. Accumulated
            # radiance moves too; the frame unsorts once by lane at the
            # end. Dead lanes sort last, enabling the prefix buckets.
            ck = coherence_key(out_rays, alive_next, bmin, binv)
            stk_cols = stk.reshape(stack_size * 7, R).T      # (R, S*7)
            stkw_cols = stk_w.reshape(stack_size * 3, R).T   # (R, S*3)
            out_rays, (out_w, out_depth, alive_next, sp, lane, radiance,
                       stk_cols, stkw_cols) = regroup_state(
                ck, out_rays, [out_w, out_depth, alive_next, sp, lane,
                               radiance, stk_cols, stkw_cols])
            stk = stk_cols.T.reshape(stack_size, 7, R)
            stk_w = stkw_cols.T.reshape(stack_size, 3, R)

        return dict(rays=out_rays, weight=out_w, depth=out_depth,
                    alive=alive_next, sp=sp, stk=stk, stk_w=stk_w,
                    radiance=radiance, lane=lane, traced=traced,
                    dropped=dropped)

    # Peel the primary trace (hybrid routing: dense primaries, sparse
    # secondaries — the reference's hybrid scheduling analog).
    state = jax.lax.cond(jnp.any(state["alive"]),
                         partial(body, bk=backend), lambda s: s, state)
    out = jax.lax.while_loop(
        cond, partial(body, bk=bounce_backend, use_prefix=do_regroup),
        state)
    radiance = out["radiance"]
    if do_regroup:
        from rayaccel_tpu.render.regroup import regroup_state as _rs
        _, (radiance,) = _rs(out["lane"], out["rays"], [radiance])
    return radiance, out["traced"], out["dropped"]


class WhittedRenderer(TiledRenderer):
    """Whitted ray tracer producing bounded ray trees per pixel."""

    def __init__(self, context: Context, camera: Camera, scene_data: SceneData,
                 tpu_scene: TpuScene | None = None,
                 environment: Environment | None = None,
                 shadows: bool = False, primary_only: bool = False):
        super().__init__(context, scene_data.viewport_width,
                         scene_data.viewport_height)
        self.camera = camera
        self.scene_data = scene_data
        self.shadows = shadows
        self.primary_only = primary_only
        self.backend = context.configuration.backend
        cluster_backends = ("mxu", "pallas", "sparse")
        if tpu_scene is not None:
            self.scene = tpu_scene
            if isinstance(tpu_scene, ClusterScene):
                if self.backend not in cluster_backends:
                    self.backend = "mxu"
            elif self.backend in cluster_backends:
                self.backend = "xla"
        elif self.backend in cluster_backends:
            self.scene = compile_clusters(scene_data)
        else:
            self.scene = compile_scene(scene_data)
        self.bounce_backend = (
            "sparse" if (context.configuration.hybrid_tracing
                         and self.backend in ("mxu", "pallas"))
            else self.backend)
        if environment is None:
            env_px = scene_data.env_pixels
            assert env_px is not None, "scene has no environment probe"
            environment = create_environment(env_px, env_px.shape[1], env_px.shape[0])
        self.environment = environment
        # main.cpp:346 forces maxDepth=8 for the Whitted demo.
        self.max_depth = int(scene_data.max_depth)
        if context.mesh is not None:
            from rayaccel_tpu.parallel.mesh import replicate_scene
            self.scene = replicate_scene(context.mesh, self.scene)
            self.environment = replicate_scene(context.mesh, self.environment)

    def _extra_wave_args(self):
        return (self.camera.as_arrays(),)

    def _build_wave_fn(self):
        scene, env = self.scene, self.environment
        max_depth = self.max_depth
        stack_size = max(self.context.configuration.max_shading_depth,
                         max_depth + 1)
        stack_depth = self.context.configuration.traversal_stack_depth
        backend = self.backend
        shard_lanes = self.wave_size
        if self.context.mesh is not None:
            shard_lanes //= self.context.mesh.devices.size
        tile = min(self.context.configuration.trace_block, shard_lanes)

        shadows = self.shadows
        primary_only = self.primary_only
        bounce_backend = self.bounce_backend
        regroup = self.context.configuration.regroup

        def wave_fn(x, y, alive, key, spp, cam_arrays):
            del spp  # Whitted uses per-frame keys only
            return whitted_trace_wave(
                scene, env, cam_arrays, x, y, alive, key,
                max_depth, stack_size, backend=backend, tile=tile,
                stack_depth=stack_depth, shadows=shadows,
                bounce_backend=bounce_backend, primary_only=primary_only,
                regroup=regroup)

        return wave_fn
