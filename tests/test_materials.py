"""BSDF tests for the reflective-diffuse material
(reference Materials.cpp:32-151 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from rayaccel_tpu.materials import (default_materials, make_material_table,
                                    reflective_diffuse,
                                    sample_reflective_diffuse)


def sample_many(k_rgb, eta, n=20000, cos_in=0.7, seed=0):
    params = jnp.broadcast_to(jnp.asarray(
        reflective_diffuse(k_rgb, eta)), (n, 4))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    sin_in = np.sqrt(1 - cos_in ** 2)
    wo = jnp.broadcast_to(jnp.asarray([sin_in, 0.0, cos_in]), (n, 3))
    rnd = jax.random.uniform(jax.random.PRNGKey(seed), (n, 3))
    return sample_reflective_diffuse(params, rnd, normal, wo)


def test_default_table_matches_demo_materials():
    t = default_materials()
    assert t.params.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(t.params)[0], [0.8, 0.8, 0.8, 1 / 1.4])
    np.testing.assert_allclose(np.asarray(t.params)[3], [0.3, 0.3, 0.3, 1 / 1.2])


def test_directions_sane():
    wi, color, transmitted = sample_many(0.5, 1 / 1.4)
    wi = np.asarray(wi)
    # The diffuse lobe is normalized; mirror lobe of unit vectors is unit.
    np.testing.assert_allclose(np.linalg.norm(wi, axis=-1), 1.0, atol=1e-3)
    assert not np.asarray(transmitted).any()  # Materials.cpp:54
    assert np.isfinite(np.asarray(color)).all()


def test_lobe_mixture_weights():
    """Lobe pick probability is s0/(s0+s1) with s0 = 3*fresnel, s1 = sum(k)
    (Materials.cpp:122-128); the weight compensates so the estimator is
    unbiased: E[color] should equal k + fresnel (each lobe's reflectance)."""
    k, eta, cosi = 0.4, 1 / 1.4, 0.7
    wi, color, _ = sample_many(k, eta, n=200000, cos_in=cosi)
    color = np.asarray(color)
    # Analytic fresnel for this configuration.
    kk = eta * eta * (cosi * cosi - 1) + 1
    cost = np.sqrt(kk)
    rper = (eta * cosi - cost) / (eta * cosi + cost)
    rpar = -((eta * cost - cosi) / (eta * cost + cosi))
    fresnel = 0.5 * (rpar ** 2 + rper ** 2)
    expected = k + fresnel
    np.testing.assert_allclose(color.mean(axis=0), expected, rtol=0.02)


def test_mirror_lobe_is_reflection():
    """With k=0 every sample picks the mirror lobe: wi must be the exact
    reflection of wo about the normal."""
    wi, color, _ = sample_many(0.0, 1 / 1.4, n=1000, cos_in=0.6)
    wi = np.asarray(wi)
    sin_in = np.sqrt(1 - 0.36)
    expected = np.array([-sin_in, 0.0, 0.6])
    np.testing.assert_allclose(wi, np.broadcast_to(expected, wi.shape), rtol=1e-5, atol=1e-5)
    # Mirror color = fresnel in all channels, scaled to sum/s0 -> sum/3.
    c = np.asarray(color)
    assert np.allclose(c[:, 0], c[:, 1]) and np.allclose(c[:, 1], c[:, 2])


def test_diffuse_lobe_cosine_distribution():
    """With fresnel ~0 relative weight (k large, normal incidence) most
    samples are diffuse; their z should follow the cosine-hemisphere
    distribution: E[z] = 2/3."""
    wi, _, _ = sample_many(1.0, 1 / 1.4, n=200000, cos_in=1.0)
    z = np.asarray(wi)[:, 2]
    diffuse = z < 0.99999  # exclude mirror samples (wi == +z exactly-ish)
    assert diffuse.mean() > 0.5
    assert abs(z[diffuse].mean() - 2 / 3) < 0.02
    assert (z > -1e-6).all()  # all in the upper hemisphere


def test_tir_forces_mirror():
    """Grazing incidence with eta > 1 gives k < 0 => total internal
    reflection: fresnel = 1 (Materials.cpp:79)."""
    wi, color, _ = sample_many(0.0, 1.4, n=1000, cos_in=0.1)
    c = np.asarray(color)
    # fresnel = 1, mirror-only: color = 1 * sum/s0 = 1.
    np.testing.assert_allclose(c, 1.0, atol=1e-4)


def test_table_construction():
    t = make_material_table([reflective_diffuse((1, 0, 0), 1.5)])
    assert t.params.shape == (1, 4)
    np.testing.assert_allclose(np.asarray(t.params)[0], [1, 0, 0, 1.5])
