"""Environment probe tests (mapping + bilinear filter, Environment.h:27-82)."""

import numpy as np
import jax.numpy as jnp

from rayaccel_tpu.environment import create_environment, sample_environment


def make_env(w=8, h=4):
    rng = np.random.default_rng(0)
    px = rng.uniform(0, 1, (h, w, 4)).astype(np.float32)
    return create_environment(px, w, h), px


def test_constant_probe_everywhere():
    px = np.full((4, 8, 4), 0.25, np.float32)
    env = create_environment(px, 8, 4)
    d = np.random.default_rng(1).normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sample_environment(env, jnp.asarray(d)))
    np.testing.assert_allclose(out, 0.25, atol=1e-6)


def test_forward_axis_center():
    # d = (-1, 0, 0): acos(-d.x) = acos(1) = 0 -> uv = (0.5, 0.5), the probe
    # center (the angular map looks down -x).
    env, px = make_env(9, 9)  # odd so center is an exact pixel
    d = jnp.asarray([[-1.0, 0.0, 0.0]])
    out = np.asarray(sample_environment(env, d))[0]
    # uv=0.5 -> pixel coord 4.0 after the -0.5 shift -> exact texel (4, 4)
    np.testing.assert_allclose(out, px[4, 4, :3], atol=1e-5)


def test_singular_direction_is_finite():
    # d = (+1, 0, 0) has dy=dz=0: rlen = inf -> r must clamp to 0
    # (Environment.h:42-43, Kernels.h:217).
    env, _ = make_env()
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    out = np.asarray(sample_environment(env, d))
    assert np.isfinite(out).all()


def test_bilinear_interpolates():
    # A horizontal gradient probe must give intermediate values.
    w, h = 16, 8
    px = np.zeros((h, w, 4), np.float32)
    px[..., 0] = np.linspace(0, 1, w)[None, :]
    env = create_environment(px, w, h)
    rng = np.random.default_rng(2)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sample_environment(env, jnp.asarray(d)))
    assert out[:, 0].min() >= 0.0 and out[:, 0].max() <= 1.0
    assert len(np.unique(np.round(out[:, 0], 3))) > 10
