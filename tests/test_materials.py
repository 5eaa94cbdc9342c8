"""BSDF unit layer (SURVEY.md §4: "BSDF white-furnace/pdf-consistency"):
sample/pdf consistency and energy conservation for every material kind."""

import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.core import rng as rng_mod
from imbatracer_tpu.render import materials as m

N = 60_000


def _params(kind, kd=(0.7, 0.7, 0.7), ks=(0.4, 0.4, 0.4), tf=(0.9, 0.9, 0.9),
            ns=20.0, ior=1.5):
    one = jnp.ones((N,))
    return m.MatParams(
        kind=jnp.full((N,), kind, jnp.int32),
        kd=jnp.broadcast_to(jnp.asarray(kd, jnp.float32), (N, 3)),
        ks=jnp.broadcast_to(jnp.asarray(ks, jnp.float32), (N, 3)),
        tf=jnp.broadcast_to(jnp.asarray(tf, jnp.float32), (N, 3)),
        ns=one * ns,
        ior=one * ior,
        emit=jnp.zeros((N, 3)),
        kd_tex=jnp.full((N,), -1, jnp.int32),
        bump_tex=jnp.full((N,), -1, jnp.int32),
        mask_tex=jnp.full((N,), -1, jnp.int32),
    )


def _frames():
    n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    gn = n
    # Fixed grazing-ish outgoing direction.
    wo = jnp.broadcast_to(
        jnp.asarray([0.3, 0.2, 0.933], jnp.float32) / jnp.sqrt(0.3**2 + 0.2**2 + 0.933**2),
        (N, 3),
    )
    return n, gn, wo


@pytest.mark.parametrize("kind", [m.MAT_DIFFUSE, m.MAT_GLOSSY, m.MAT_PHONG,
                                  m.MAT_OREN_NAYAR])
def test_sample_pdf_consistency(kind):
    """pdf reported by sample() must equal pdf() at the sampled direction
    (required for correct MIS)."""
    p = _params(kind)
    n, gn, wo = _frames()
    state = rng_mod.seed(jnp.arange(N), kind)
    state, (u1, u2, u3) = rng_mod.next_floats(state, 3)
    wi, f, pdf, spec, valid = m.sample_bsdf(p, n, gn, wo, u1, u2, u3)
    v = np.asarray(valid)
    assert v.mean() > 0.5
    pdf2 = m.pdf_bsdf(p, n, gn, wo, wi)
    np.testing.assert_allclose(
        np.asarray(pdf)[v], np.asarray(pdf2)[v], rtol=2e-3, atol=1e-6
    )
    f2 = m.eval_bsdf(p, n, gn, wo, wi)
    np.testing.assert_allclose(
        np.asarray(f)[v], np.asarray(f2)[v], rtol=2e-3, atol=1e-6
    )


@pytest.mark.parametrize("kind,albedo_max", [
    (m.MAT_DIFFUSE, 0.71),
    (m.MAT_OREN_NAYAR, 0.71),
    (m.MAT_PHONG, 1.0),
    (m.MAT_GLOSSY, 1.0),
    (m.MAT_MIRROR, 1.0),
    (m.MAT_GLASS, 1.01),
])
def test_white_furnace_bound(kind, albedo_max):
    """Directional albedo E[f |cos| / pdf] must never exceed 1 (energy
    conservation), and for diffuse it equals kd."""
    p = _params(kind)
    n, gn, wo = _frames()
    state = rng_mod.seed(jnp.arange(N), 100 + kind)
    state, (u1, u2, u3) = rng_mod.next_floats(state, 3)
    wi, f, pdf, spec, valid = m.sample_bsdf(p, n, gn, wo, u1, u2, u3)
    cos_i = jnp.abs(jnp.sum(wi * n, axis=-1))
    weight = jnp.where(
        valid[:, None], f * (cos_i / jnp.maximum(pdf, 1e-20))[:, None], 0.0
    )
    albedo = float(jnp.mean(weight[:, 0]))
    assert albedo <= albedo_max + 0.02, albedo
    if kind == m.MAT_DIFFUSE:
        np.testing.assert_allclose(albedo, 0.7, atol=0.02)


def test_glass_energy_split():
    """Fresnel split: reflection + transmission weights together conserve
    energy for an ideal glass (ks=tf=1)."""
    p = _params(m.MAT_GLASS, ks=(1, 1, 1), tf=(1, 1, 1))
    n, gn, wo = _frames()
    state = rng_mod.seed(jnp.arange(N), 7)
    state, (u1, u2, u3) = rng_mod.next_floats(state, 3)
    wi, f, pdf, spec, valid = m.sample_bsdf(p, n, gn, wo, u1, u2, u3)
    cos_i = jnp.abs(jnp.sum(wi * n, axis=-1))
    w = jnp.where(valid, f[:, 0] * cos_i / jnp.maximum(pdf, 1e-20), 0.0)
    total = float(jnp.mean(w))
    # Radiance transport scales transmission by (eta_i/eta_t)^2 = 1/2.25
    # going in, so total < 1; it must sit between the TIR-free bounds.
    assert 0.4 < total <= 1.01, total
