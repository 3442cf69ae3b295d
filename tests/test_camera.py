"""Camera tests (lookAt frame construction + ray generation,
Camera.cpp:13-114)."""

import numpy as np
import jax
import jax.numpy as jnp

from rayaccel_tpu.camera import Camera, generate_pixel_rays


def test_center_ray_points_forward():
    cam = Camera.look_at((0, 0, 0), (0, 0, -5), (0, 1, 0), 60.0, 64, 64)
    # key=None samples pixel centers (+0.5); the exact forward direction is
    # at image coordinate width/2 = 32, i.e. pixel index 31.5.
    rays = generate_pixel_rays(cam.as_arrays(),
                               jnp.asarray([31.5]), jnp.asarray([31.5]),
                               key=None)
    d = np.asarray(rays.d)[0]
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays.o)[0], [0, 0, 0], atol=1e-6)


def test_directions_normalized_and_jittered():
    cam = Camera.look_at((1, 2, 3), (4, 5, 6), (0, 1, 0), 45.0, 128, 96)
    xx, yy = np.meshgrid(np.arange(128), np.arange(96))
    rays = generate_pixel_rays(cam.as_arrays(),
                               jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()),
                               key=jax.random.PRNGKey(0))
    d = np.asarray(rays.d)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    rays2 = generate_pixel_rays(cam.as_arrays(),
                                jnp.asarray(xx.ravel()), jnp.asarray(yy.ravel()),
                                key=jax.random.PRNGKey(1))
    assert not np.allclose(d, np.asarray(rays2.d))


def test_fov_extent():
    # At fov=90, the horizontal half-extent equals aspect*tan(45) = aspect.
    w = h = 100
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, w, h)
    left = generate_pixel_rays(cam.as_arrays(), jnp.asarray([0.0]),
                               jnp.asarray([h / 2.0]), key=None)
    d = np.asarray(left.d)[0]
    # Unnormalized x/z ratio ~ tan(45 deg) = 1 at the image edge (half pixel in).
    assert abs(abs(d[0] / d[2]) - 1.0) < 0.05


def test_rotate_preserves_forward_norm():
    cam = Camera.look_at((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 64, 64)
    rot = cam.rotate(0.3, (0, 1, 0))
    np.testing.assert_allclose(np.linalg.norm(rot.forward()), 1.0, atol=1e-6)
    # Rotating back recovers the original forward.
    back = rot.rotate(-0.3, (0, 1, 0))
    np.testing.assert_allclose(back.forward(), cam.forward(), atol=1e-5)
