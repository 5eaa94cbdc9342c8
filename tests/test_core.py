"""Unit tests for RNG, vector math and sampling primitives."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.core import rng, sampling, vecmath


def test_rng_uniformity_and_decorrelation():
    n = 200_000
    state = rng.seed(jnp.arange(n), 0)
    state, u = rng.next_float(state)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 3e-3
    assert abs(np.var(u) - 1.0 / 12.0) < 1e-3
    # Sequential draws from the same stream must decorrelate.
    state2, u2 = rng.next_float(state)
    corr = np.corrcoef(u, np.asarray(u2))[0, 1]
    assert abs(corr) < 5e-3
    # Neighbouring pixels produce decorrelated streams.
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 5e-3


def test_rng_streams_differ_by_sample_and_frame():
    s0 = rng.seed(jnp.arange(100), 0, frame=0)
    s1 = rng.seed(jnp.arange(100), 1, frame=0)
    s2 = rng.seed(jnp.arange(100), 0, frame=1)
    assert not np.array_equal(np.asarray(s0), np.asarray(s1))
    assert not np.array_equal(np.asarray(s0), np.asarray(s2))


def test_onb_orthonormal():
    n = sampling.normalize(jnp.array(np.random.RandomState(0).randn(1000, 3), jnp.float32))
    t, b = sampling.local_coordinates(n)
    for v in (t, b):
        np.testing.assert_allclose(np.asarray(vecmath.length(v)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vecmath.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vecmath.dot(t, n)), 0.0, atol=1e-5)
    # Right-handed: t x b = n
    np.testing.assert_allclose(np.asarray(vecmath.cross(t, b)), np.asarray(n), atol=1e-5)


def _mc_pdf_integral(sample_fn, n=200_000, seed_val=42):
    """E[1/pdf] over sampled dirs must equal the domain measure."""
    state = rng.seed(jnp.arange(n), seed_val)
    state, (u1, u2) = rng.next_floats(state, 2)
    d, pdf = sample_fn(u1, u2)
    assert np.all(np.asarray(pdf) > 0)
    np.testing.assert_allclose(np.asarray(vecmath.length(d)), 1.0, atol=1e-4)
    return float(jnp.mean(1.0 / pdf))


def test_cos_hemisphere_pdf_integrates_to_2pi():
    integral = _mc_pdf_integral(sampling.sample_cos_hemisphere)
    assert abs(integral - 2 * np.pi) < 0.15


def test_uniform_sphere_pdf_integrates_to_4pi():
    integral = _mc_pdf_integral(sampling.sample_uniform_sphere)
    assert abs(integral - 4 * np.pi) < 1e-3


def test_power_cos_pdf_consistency():
    n = 100_000
    state = rng.seed(jnp.arange(n), 7)
    state, (u1, u2) = rng.next_floats(state, 2)
    d, pdf = sampling.sample_power_cos_hemisphere(jnp.float32(20.0), u1, u2)
    pdf2 = sampling.power_cos_hemisphere_pdf(jnp.float32(20.0), d[..., 2])
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-4)


def test_cone_sampling_within_cone():
    n = 50_000
    cos_max = jnp.float32(np.cos(np.deg2rad(30.0)))
    state = rng.seed(jnp.arange(n), 3)
    state, (u1, u2) = rng.next_floats(state, 2)
    d, pdf = sampling.sample_uniform_cone(cos_max, u1, u2)
    assert np.asarray(d[..., 2]).min() >= float(cos_max) - 1e-5
    integral = float(jnp.mean(1.0 / pdf))
    expected = 2 * np.pi * (1 - float(cos_max))
    assert abs(integral - expected) < 1e-3


def test_concentric_disc_in_unit_disc():
    n = 50_000
    state = rng.seed(jnp.arange(n), 9)
    state, (u1, u2) = rng.next_floats(state, 2)
    x, y = sampling.sample_concentric_disc(u1, u2)
    r2 = np.asarray(x * x + y * y)
    assert r2.max() <= 1.0 + 1e-5
    # Area uniformity: mean radius^2 of uniform disc = 1/2
    assert abs(r2.mean() - 0.5) < 5e-3


def test_uniform_triangle_barycentrics():
    n = 50_000
    state = rng.seed(jnp.arange(n), 11)
    state, (u1, u2) = rng.next_floats(state, 2)
    u, v = sampling.sample_uniform_triangle(u1, u2)
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (v >= 0).all() and (u + v <= 1.0 + 1e-5).all()
    # Centroid of a uniform distribution over the unit right triangle.
    assert abs(u.mean() - 1 / 3) < 5e-3 and abs(v.mean() - 1 / 3) < 5e-3


def test_mis_power_heuristic():
    w = sampling.mis_power_heuristic(jnp.float32(1.0), jnp.float32(3.0))
    np.testing.assert_allclose(float(w), 0.25, rtol=1e-6)
