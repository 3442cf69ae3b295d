"""Cross-engine agreement oracle, callable from bench.py (config 7) and
tools/oracle_tpu.py.

The reference's de-facto oracle is its runnable backend flag matrix —
the same frame must agree with any engine disabled (main.cpp:289-302).
Here the three cluster engines trace the same rays on the CURRENT
backend (real hardware when invoked from bench.py — interpret-mode CI
provably missed a Mosaic miscompile in round 3, docs/PERF_NOTES.md
incidents) and must agree on hits within tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.trace_mxu import trace_mxu
from rayaccel_tpu.ops.trace_pallas import trace_mxu_pallas
from rayaccel_tpu.ops.trace_sparse import trace_sparse
from rayaccel_tpu.types import Rays


def _trace(bk, cs, rays, tile):
    if bk == "mxu":
        res = trace_mxu(cs, rays, tile=tile)
        ov = 0
    elif bk == "pallas":
        res, ov = trace_mxu_pallas(cs, rays, tile=tile)
    else:
        # Exactness budgets: the oracle's mid-frame PRIMARY rays carry
        # ~3.1 lattice pairs/ray (vs ~2.1 on production bounce pools),
        # overflowing the default pair_budget=3 cap by ~5.5k pairs
        # (arbitrary truncation -> ~2% wrong hits), and long camera
        # rays need more spill restarts than the default 4. The engine
        # is exact given budget — the agreement gate grants it:
        # pair_budget=k_pairs makes the cap cover the whole lattice.
        res, ov = trace_sparse(cs, rays, max_passes=16, pair_budget=4)
    return np.asarray(res.hits.tri), np.asarray(res.hits.t), int(ov)


def run_oracle(cs, sd, n_rays=65536, tile=1024, key=None):
    """Trace coherent primaries (pallas + sparse vs mxu) and scattered
    box rays (sparse vs mxu) and score agreement. Returns (rows, ok):
    one dict per engine/ray-class comparison; ok requires >99.95% hit
    agreement and t agreement within 1e-3 relative."""
    key = jax.random.PRNGKey(42) if key is None else key
    cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                         sd.viewport_width, sd.viewport_height).as_arrays()

    def ray_sets():
        # Coherent primaries exactly as production makes them:
        # block-swizzled screen tiles (the dense engines' contract).
        from rayaccel_tpu.render.tiled import block_swizzle
        _, x, y = block_swizzle(sd.viewport_width, sd.viewport_height,
                                max(n_rays, 983040))
        # Mid-frame lanes: the swizzle's FIRST waves cover the top of the
        # screen, which is pure sky on battlefield-class cameras — a
        # 0-hit ray set passes every agreement check vacuously. The
        # middle of the frame looks at geometry.
        base = (x.shape[0] - n_rays) // 2
        prim = generate_pixel_rays(
            cam, jnp.asarray(x[base:base + n_rays], jnp.int32),
            jnp.asarray(y[base:base + n_rays], jnp.int32),
            key=jax.random.fold_in(key, 0))
        yield "primary", prim, ("pallas", "sparse")
        # Scattered rays: the hybrid router sends these to the sparse
        # engine only (dense per-tile queue caps would truncate).
        lo = jnp.min(cs.cl_bbmin, axis=0)
        hi = jnp.max(cs.cl_bbmax, axis=0)
        k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
        o = jax.random.uniform(k1, (n_rays, 3)) * (hi - lo) + lo
        d = jax.random.normal(k2, (n_rays, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        yield "scattered", Rays(o, d, jnp.full((n_rays,), 1e-3),
                                jnp.full((n_rays,), 1e6)), ("sparse",)
        # All-miss set: a dispatch with ZERO candidate pairs builds its
        # pallas work-item list entirely from dead lanes — the exact
        # shape that crashed with an out-of-bounds G block fetch in
        # round 4 (see trace_sparse pair_branch clamp). Keep it
        # exercised on hardware; interpret-mode cannot catch OOB block
        # reads.
        up = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32),
                      (n_rays, 1))
        o_sky = up * (hi[None, :] + 10.0)
        yield "sky", Rays(o_sky, up, jnp.full((n_rays,), 1e-3),
                          jnp.full((n_rays,), 1e6)), ("pallas", "sparse")

    rows = []
    for name, rays, engines in ray_sets():
        ref_tri, ref_t, _ = _trace("mxu", cs, rays, tile)
        for bk in engines:
            tri, t, ov = _trace(bk, cs, rays, tile)
            hit_ref = ref_tri >= 0
            hit_bk = tri >= 0
            hit_agree = float((hit_ref == hit_bk).mean())
            both = hit_ref & hit_bk
            tri_agree = (float((tri[both] == ref_tri[both]).mean())
                         if both.any() else 1.0)
            # Near-tie tolerance: engines may pick either of two
            # coplanar/shared-edge winners; t must still agree.
            rel = (np.abs(t[both] - ref_t[both])
                   / np.maximum(ref_t[both], 1e-6))
            t_ok = float((rel < 1e-3).mean()) if both.any() else 1.0
            rows.append(dict(rays=name, engine=f"{bk} vs mxu",
                             hit_agree=round(hit_agree, 6),
                             tri_agree=round(tri_agree, 6),
                             t_within_1e3=round(t_ok, 6),
                             overflow=ov, n=int(ref_tri.size)))
        # Any-hit (shadow) kernels on the same rays, vs the exact mxu
        # any-hit: a bool-agreement row per engine (round 5: certifies
        # the occlusion kernel's per-lane early-out on hardware).
        from rayaccel_tpu.ops.trace_mxu import trace_occlusion_mxu
        from rayaccel_tpu.ops.trace_pallas import trace_occlusion_pallas
        from rayaccel_tpu.ops.trace_sparse import trace_occlusion_sparse
        occ_ref = np.asarray(trace_occlusion_mxu(cs, rays, tile=tile))
        for bk in engines:
            if bk == "pallas":
                occ = np.asarray(
                    trace_occlusion_pallas(cs, rays, tile=tile))
                ov = 0
            else:
                # Same exactness-budget grant as the closest-hit row
                # above: mid-frame primaries carry ~3.1 lattice pairs/
                # ray, so the default pair_budget=3 TRUNCATES ~5.5k
                # pairs — truncated pairs report unoccluded (the
                # counted bright-leak direction), which read as
                # disagreement here (hw6: 97.9% agree, 5527 counted).
                # max_passes was measured irrelevant (4/8/16 identical).
                occ_j, un = trace_occlusion_sparse(
                    cs, rays, pair_budget=4, max_passes=16)
                occ, ov = np.asarray(occ_j), int(un)
            agree = float((occ == occ_ref).mean())
            rows.append(dict(rays=name, engine=f"occl:{bk} vs mxu",
                             hit_agree=round(agree, 6), tri_agree=1.0,
                             t_within_1e3=1.0, overflow=ov,
                             n=int(occ_ref.size)))
    ok = all(r["hit_agree"] > 0.9995 and r["t_within_1e3"] > 0.9995
             for r in rows)
    return rows, ok


def run_image_oracle(cs, sd, n_spp=2, viewport=(320, 180), max_depth=2,
                     opts=None, key=None):
    """Bench-scale whole-image agreement (VERDICT r4 missing #2): render
    the same small-but-real battlefield frame with the PRODUCTION pooled
    path (pallas primaries + sparse bounces on the cluster scene) and the
    ``xla`` reference engine (lockstep BVH2/TrianglePair traversal on the
    BVH scene) and report the RMSE between the accumulated HDR images.

    The reference's de-facto oracle is whole images agreeing across its
    backend flag matrix (main.cpp:289-302). Both paths here run the SAME
    pt_trace_frame function with the SAME key: primary jitter and BSDF
    draws are identical (stage-1 draws are positional at equal widths;
    bounce draws are lane-keyed and placement-invariant), so the images
    differ only where the ENGINES disagree — shared-edge tie-breaks and
    t/u/v ulp divergence between the bilinear-MT cluster math and the
    BVH pair math. Returns a dict with image_rmse and supporting stats.
    """
    import numpy as np

    from rayaccel_tpu.config import EngineOpts
    from rayaccel_tpu.render.pathtracer import pt_trace_frame
    from rayaccel_tpu.render.tiled import block_swizzle
    from rayaccel_tpu.scene.compile import compile_scene

    key = jax.random.PRNGKey(7) if key is None else key
    opts = EngineOpts() if opts is None else opts
    w, h = viewport
    sd_small = type(sd)(**{**sd.__dict__, "viewport_width": w,
                           "viewport_height": h, "max_depth": max_depth})
    bvh_scene = compile_scene(sd_small)
    cam = Camera.look_at(sd.cam_origin, sd.cam_dir, sd.cam_up, sd.cam_fov,
                         w, h).as_arrays()
    from rayaccel_tpu.render.tiled import BLOCK_H, BLOCK_W
    n_blocks = (-(-w // BLOCK_W)) * (-(-h // BLOCK_H))
    N = n_blocks * BLOCK_W * BLOCK_H
    perm, x, y = block_swizzle(w, h, N)
    xs = jnp.asarray(x, jnp.int32).reshape(1, N)
    ys = jnp.asarray(y, jnp.int32).reshape(1, N)
    alives = jnp.asarray(perm >= 0).reshape(1, N)

    from rayaccel_tpu.environment import create_environment
    px = sd_small.env_pixels
    env = create_environment(px, px.shape[1], px.shape[0])

    def render(scene, backend, bounce_backend, tile):
        fb = jnp.zeros((1, N, 3), jnp.float32)
        for i in range(n_spp):
            rad, _, _ = pt_trace_frame(
                scene, env, cam, xs, ys, alives,
                jax.random.fold_in(key, i), max_depth, backend=backend,
                tile=tile, bounce_backend=bounce_backend, opts=opts)
            fb = fb + rad
        return np.asarray(fb[0]) / n_spp

    img_prod = render(cs, "pallas", "sparse", 1024)
    img_ref = render(bvh_scene, "xla", "xla", 1024)
    valid = np.asarray(perm >= 0)
    diff = (img_prod - img_ref)[valid]
    rmse = float(np.sqrt(np.mean(diff * diff)))
    pix_diff = np.abs(diff).max(axis=1)
    # Two-class gate (docs/ORACLE_TPU.md): pixels whose paths CHAOTICALLY
    # diverged (a shared-edge winner flip on some segment — measured
    # ~4e-4/trace between independent fp32 intersection algebras —
    # re-aims every later segment, so the radiance difference is
    # full-magnitude regardless of how small the underlying ulp gap was)
    # are counted as ``frac_flip``; the REST of the image must meet the
    # north-star 1e-3 RMSE (``rmse_trimmed``). Raw RMSE is reported but
    # not gated: it is dominated by the flip class times depth, an
    # engine-INDEPENDENT chaos floor (mxu-vs-xla shows the same), not an
    # accuracy property of the engine under test. Median pixel diff is 0
    # — the images are bitwise-equal almost everywhere.
    flip = pix_diff > 0.05
    d_trim = diff[~flip]
    rmse_trim = float(np.sqrt(np.mean(d_trim * d_trim)))
    return dict(image_rmse=round(rmse, 8),
                rmse_trimmed=round(rmse_trim, 8),
                frac_flip=round(float(flip.mean()), 6),
                max_abs=round(float(pix_diff.max()), 6),
                frac_gt_1e3=round(float((pix_diff > 1e-3).mean()), 6),
                n_pixels=int(valid.sum()), spp=n_spp,
                viewport=[w, h], depth=max_depth)
