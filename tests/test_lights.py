"""Point / directional / spot light sampling tests.

The reference exercises these kinds only through `.scene` files
(build_scene.cpp:366-420); here each kind gets (a) unit checks of the
dual-pdf contract against the closed forms in light.h:192-359, and (b) an
end-to-end cross-algorithm agreement render (PT vs BPT share no sampling
code path for a kind: PT uses sample_direct only, BPT adds sample_emit —
agreement validates both against each other)."""

import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.core.sampling import PI
from imbatracer_tpu.render import lights as lm
from imbatracer_tpu.scene.procedural import make_cornell_scene
from tests.test_integrators import _render

BS = lm.BSphere(
    center=jnp.zeros(3), radius=jnp.float32(10.0),
    inv_radius_sqr=jnp.float32(1.0 / 100.0),
)


def _table(row):
    return lm.build_light_table([row])


def _uniform(n, seed):
    rs = np.random.RandomState(seed)
    return [jnp.asarray(rs.rand(n).astype(np.float32)) for _ in range(4)]


def test_point_light_direct():
    """radiance = I/(4 pi d^2), pdf_direct_w = d^2, pdf_emit = 1/(4 pi)
    (light.h:266-283)."""
    I = np.array([10.0, 5.0, 2.0], np.float32)
    t = _table(dict(kind=lm.LIGHT_POINT, p0=(1.0, 2.0, 3.0), intensity=I))
    pos = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 3.0]], jnp.float32)
    idx = jnp.zeros(2, jnp.int32)
    u1, u2, _, _ = _uniform(2, 0)
    ds = lm.sample_direct(t, idx, pos, u1, u2, BS)
    d = np.array([[1, 2, 3], [0, 2, 0]], np.float32)
    dist = np.linalg.norm(d, axis=-1)
    np.testing.assert_allclose(np.asarray(ds.distance), dist, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ds.dir), d / dist[:, None], rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ds.radiance), I / (4 * np.pi * dist * dist)[:, None],
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(ds.pdf_direct_w), dist * dist, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ds.pdf_emit_w), 1.0 / (4 * np.pi), rtol=1e-5)
    assert bool(ds.is_delta.all())


def test_point_light_emit():
    """Emission directions cover the sphere uniformly; pdf normalises:
    E[1/pdf] = 4 pi (light.h:249-264)."""
    t = _table(dict(kind=lm.LIGHT_POINT, p0=(1.0, 2.0, 3.0),
                    intensity=(1.0, 1.0, 1.0)))
    n = 4096
    u1, u2, u3, u4 = _uniform(n, 1)
    es = lm.sample_emit(t, jnp.zeros(n, jnp.int32), u1, u2, u3, u4, BS)
    np.testing.assert_allclose(np.asarray(es.pos), np.tile([1.0, 2.0, 3.0], (n, 1)), rtol=1e-6)
    d = np.asarray(es.dir)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)
    assert np.abs(d.mean(axis=0)).max() < 0.05           # isotropy
    np.testing.assert_allclose(
        float(jnp.mean(1.0 / es.pdf_emit_w)), 4 * np.pi, rtol=1e-5
    )
    assert bool(es.is_finite.all()) and bool(es.is_delta.all())


def test_spot_light():
    """In-cone radiance I/d^2, zero outside; emission stays in the cone and
    E[1/pdf] equals the cone solid angle (light.h:292-359)."""
    cos_a = np.cos(np.deg2rad(30.0)).astype(np.float32)
    I = np.array([8.0, 4.0, 2.0], np.float32)
    t = _table(dict(kind=lm.LIGHT_SPOT, p0=(0.0, 2.0, 0.0),
                    normal=(0.0, -1.0, 0.0), intensity=I, cos_angle=cos_a))
    # Receiver straight below (in cone) and far to the side (out of cone).
    pos = jnp.asarray([[0.0, 0.0, 0.0], [5.0, 2.0, 0.0]], jnp.float32)
    u1, u2, _, _ = _uniform(2, 2)
    ds = lm.sample_direct(t, jnp.zeros(2, jnp.int32), pos, u1, u2, BS)
    np.testing.assert_allclose(np.asarray(ds.radiance)[0], I / 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ds.radiance)[1], 0.0)
    np.testing.assert_allclose(np.asarray(ds.pdf_direct_w), [4.0, 25.0], rtol=1e-5)

    n = 4096
    u1, u2, u3, u4 = _uniform(n, 3)
    es = lm.sample_emit(t, jnp.zeros(n, jnp.int32), u1, u2, u3, u4, BS)
    d = np.asarray(es.dir)
    cos_axis = -d[:, 1]                                   # axis = (0,-1,0)
    assert (cos_axis >= cos_a - 1e-5).all(), "emission left the cone"
    solid_angle = 2 * np.pi * (1.0 - cos_a)
    np.testing.assert_allclose(
        float(jnp.mean(1.0 / es.pdf_emit_w)), solid_angle, rtol=1e-4
    )


def test_dir_light():
    """Fixed direction, infinite distance, disc emission over the scene
    bounding sphere (light.h:192-241)."""
    nrm = np.asarray([0.6, -0.8, 0.0], np.float32)
    I = np.array([2.0, 3.0, 4.0], np.float32)
    t = _table(dict(kind=lm.LIGHT_DIR, normal=nrm, intensity=I))
    pos = jnp.zeros((4, 3), jnp.float32)
    u1, u2, _, _ = _uniform(4, 4)
    ds = lm.sample_direct(t, jnp.zeros(4, jnp.int32), pos, u1, u2, BS)
    np.testing.assert_allclose(np.asarray(ds.dir), np.tile(-nrm, (4, 1)), rtol=1e-5)
    assert (np.asarray(ds.distance) >= 1e29).all()
    np.testing.assert_allclose(np.asarray(ds.radiance), np.tile(I, (4, 1)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ds.pdf_direct_w), 1.0)
    disc_pdf = 1.0 / np.pi * float(BS.inv_radius_sqr)
    np.testing.assert_allclose(np.asarray(ds.pdf_emit_w), disc_pdf, rtol=1e-5)

    n = 4096
    u1, u2, u3, u4 = _uniform(n, 5)
    es = lm.sample_emit(t, jnp.zeros(n, jnp.int32), u1, u2, u3, u4, BS)
    np.testing.assert_allclose(np.asarray(es.dir), np.tile(nrm, (n, 1)), rtol=1e-4)
    assert not bool(es.is_finite.any())
    # Emission origins lie on the upstream hemisphere's tangent disc.
    p = np.asarray(es.pos) - np.asarray(BS.center)
    assert (np.linalg.norm(p, axis=-1) <= 10.0 * np.sqrt(2.0) + 1e-3).all()
    np.testing.assert_allclose(np.asarray(es.pdf_emit_w), disc_pdf, rtol=1e-5)


@pytest.mark.parametrize("kind", ["point", "spot", "dir"])
def test_integrators_agree_on_kind(kind):
    """PT (sample_direct only) vs BPT (adds sample_emit + full MIS) must
    estimate the same image for each delta light kind."""
    scene, meta = make_cornell_scene(with_boxes=True, light=kind)
    frames = 24
    a = _render(scene, meta, "pt", frames=frames, max_len=4, lpc=1024)
    b = _render(scene, meta, "bpt", frames=frames, max_len=4, lpc=1024)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert a.mean() > 1e-4, f"{kind}: PT image black"
    rel = abs(b.mean() - a.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.15, f"{kind}: bpt mean {b.mean():.5f} vs pt {a.mean():.5f}"
    corr = np.corrcoef(a.mean(-1), b.mean(-1))[0, 1]
    assert corr > 0.95, f"{kind}: correlation {corr:.3f}"
