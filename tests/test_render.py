"""Integrator tests: golden checks against direct oracle evaluation and the
invariants mirrored from the reference's runtime asserts (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import rayaccel_tpu as racc
from rayaccel_tpu.environment import create_environment, sample_environment
from rayaccel_tpu.camera import Camera, generate_pixel_rays
from rayaccel_tpu.ops.bruteforce import trace_bruteforce
from rayaccel_tpu.types import INVALID_TRIANGLE


def make_context(wave_size=4096):
    cfg = racc.Configuration(wave_size=wave_size)
    return racc.create_context(cfg)


@pytest.fixture(scope="module")
def small_scene():
    from rayaccel_tpu.scene.loader import make_test_scene
    s = make_test_scene(viewport=(64, 64), max_depth=3)
    return s


def env_of(scene_data):
    px = scene_data.env_pixels
    return create_environment(px, px.shape[1], px.shape[0])


def test_pt_depth0_matches_oracle(small_scene):
    """With max_depth=0 a pixel is exactly env radiance on miss, 0 on hit
    (misses contribute, hits terminate): checkable without any BVH."""
    s = small_scene
    s0 = type(s)(**{**s.__dict__, "max_depth": 0})
    ctx = make_context()
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    r = racc.PathTracingRenderer(ctx, cam, s0)
    key = jax.random.PRNGKey(0)
    stats = r.render_frame(key)
    img = r.image().reshape(-1, 3)

    # Oracle: regenerate the same primary rays (same key path) and evaluate.
    n = s.viewport_width * s.viewport_height
    assert int(stats.rays_traced) == n
    idx = np.arange(n)
    x = jnp.asarray(idx % s.viewport_width)
    y = jnp.asarray(idx // s.viewport_width)
    wave_key = jax.random.fold_in(key, 0)
    rays = generate_pixel_rays(cam.as_arrays(), x, y,
                               key=jax.random.fold_in(wave_key, 0))
    hits = trace_bruteforce(r.scene.tri_verts, rays)
    miss = np.asarray(hits.tri) == INVALID_TRIANGLE
    env_rgb = np.asarray(sample_environment(env_of(s), rays.d))
    expected = np.where(miss[:, None], env_rgb, 0.0)
    np.testing.assert_allclose(img, expected, atol=1e-4)


def test_pt_progressive_and_finite(small_scene):
    ctx = make_context()
    s = small_scene
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    r = racc.PathTracingRenderer(ctx, cam, s)
    total = 0
    for i in range(3):
        stats = r.render_frame(jax.random.PRNGKey(i))
        total += int(stats.rays_traced)
    assert r.spp == 3
    img = r.image()
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    assert img.max() > 0.01, "image should not be black"
    n = s.viewport_width * s.viewport_height
    # Ray conservation: every pixel traces at least the primary each frame,
    # at most max_depth+1 rays (RayAccelerator.cpp:63-74 analog).
    assert 3 * n <= total <= 3 * n * (s.max_depth + 1)


def test_pt_variance_decreases(small_scene):
    """Progressive accumulation converges: the mean over many spp should
    have lower deviation-to-converged than 1 spp."""
    ctx = make_context()
    s = small_scene
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    r = racc.PathTracingRenderer(ctx, cam, s)
    r.render_frame(jax.random.PRNGKey(0))
    img1 = r.image()
    for i in range(1, 8):
        r.render_frame(jax.random.PRNGKey(i))
    img8 = r.image()
    r2 = racc.PathTracingRenderer(ctx, cam, s)
    for i in range(8, 24):
        r2.render_frame(jax.random.PRNGKey(i))
    ref = r2.image()
    err1 = np.sqrt(np.mean((img1 - ref) ** 2))
    err8 = np.sqrt(np.mean((img8 - ref) ** 2))
    assert err8 < err1


def test_whitted_renders_and_pool_drains(small_scene):
    ctx = make_context()
    s = small_scene
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    s8 = type(s)(**{**s.__dict__, "max_depth": 8})  # main.cpp:346
    r = racc.WhittedRenderer(ctx, cam, s8)
    stats = r.render_frame(jax.random.PRNGKey(0))
    img = r.image()
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.max() > 0.01
    # Pool-drained invariant (WhittedRenderer.cpp:62): no overflow drops.
    assert r.dropped == 0
    n = s.viewport_width * s.viewport_height
    assert int(stats.rays_traced) >= n


def test_whitted_deterministic(small_scene):
    ctx = make_context()
    s = small_scene
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    imgs = []
    for _ in range(2):
        r = racc.WhittedRenderer(ctx, cam, s)
        r.render_frame(jax.random.PRNGKey(7))
        imgs.append(r.image())
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_render_api_parity(small_scene):
    """racc::render-shaped API drives a frame (RayAccelerator.h:115)."""
    ctx = make_context()
    s = small_scene
    cam = Camera.look_at(s.cam_origin, s.cam_dir, s.cam_up, s.cam_fov,
                         s.viewport_width, s.viewport_height)
    r = racc.PathTracingRenderer(ctx, cam, s)
    stats = racc.render(ctx, None, None, r)
    assert int(stats.rays_traced) > 0
    assert r.spp == 1
