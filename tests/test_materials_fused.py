"""eval_pdf_bsdf must be bitwise-identical to the three separate calls.

The fused form (materials.py::eval_pdf_bsdf) shares the tangent frame,
the geometric-side test, the Blinn half-vector power and the Phong lobe
dot across eval/pdf_fwd/pdf_rev; every shared subexpression is argued
commutative-bitwise-equal in the implementation, and this test holds it
to that claim over all six material kinds and adversarial directions
(grazing, cross-hemisphere, wrong geometric side).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.render import materials as mat


def _rand_unit(rng, n):
    v = rng.standard_normal((n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _params(rng, n):
    kinds = rng.integers(0, 6, n).astype(np.int32)
    return mat.MatParams(
        kind=jnp.asarray(kinds),
        kd=jnp.asarray(rng.random((n, 3), dtype=np.float32)),
        ks=jnp.asarray(rng.random((n, 3), dtype=np.float32)),
        tf=jnp.asarray(rng.random((n, 3), dtype=np.float32)),
        ns=jnp.asarray(1.0 + 200.0 * rng.random(n, dtype=np.float32)),
        ior=jnp.asarray(1.1 + rng.random(n, dtype=np.float32)),
        emit=jnp.zeros((n, 3), jnp.float32),
        kd_tex=jnp.full((n,), -1, jnp.int32),
        bump_tex=jnp.full((n,), -1, jnp.int32),
        mask_tex=jnp.full((n,), -1, jnp.int32),
    )


@pytest.mark.parametrize("seed", [0, 7])
def test_fused_matches_separate_bitwise(seed):
    rng = np.random.default_rng(seed)
    n = 4096
    p = _params(rng, n)
    nrm = jnp.asarray(_rand_unit(rng, n))
    # Geometric normal: mostly aligned, some flipped/perturbed so the
    # same_geom rejection path is exercised.
    gn_np = _rand_unit(rng, n)
    mix = rng.random(n) < 0.7
    gn = jnp.asarray(np.where(mix[:, None], np.asarray(nrm), gn_np))
    wo = jnp.asarray(_rand_unit(rng, n))
    wi = jnp.asarray(_rand_unit(rng, n))
    # Sprinkle near-grazing directions (the clamp-sensitive regime).
    graze = jnp.asarray(_rand_unit(rng, n))
    graze = graze.at[:, 2].set(1e-7)
    wi = jnp.where((jnp.arange(n) % 13 == 0)[:, None], graze, wi)

    @jax.jit
    def separate(pd, nrm, gn, wo, wi):
        p = mat.MatParams(pd)
        return (mat.eval_bsdf(p, nrm, gn, wo, wi),
                mat.pdf_bsdf(p, nrm, gn, wo, wi),
                mat.pdf_bsdf(p, nrm, gn, wi, wo))

    @jax.jit
    def fused(pd, nrm, gn, wo, wi):
        return mat.eval_pdf_bsdf(mat.MatParams(pd), nrm, gn, wo, wi)

    f0, pf0, pr0 = separate(dict(p), nrm, gn, wo, wi)
    f1, pf1, pr1 = fused(dict(p), nrm, gn, wo, wi)

    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(pf0), np.asarray(pf1))
    np.testing.assert_array_equal(np.asarray(pr0), np.asarray(pr1))
