"""Pallas dense-intersection kernel vs the reference traversal (runs in
interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.ops import pallas_intersect as pk
from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.traverse import closest_hit
from imbatracer_tpu.scene.procedural import make_cornell_scene


def test_pallas_dense_matches_bvh():
    if jax.default_backend() == "cpu":
        # Interpreter mode so the kernel logic is exercised without Mosaic.
        import jax.experimental.pallas as pl
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        pk.pl.pallas_call = interp
        try:
            _run_check()
        finally:
            pl.pallas_call = orig
            pk.pl.pallas_call = orig
    else:
        _run_check()


def _run_check():
    scene, _ = make_cornell_scene()
    tris12 = pk.make_tris12(scene.bvh)
    rs = np.random.RandomState(5)
    n = 2048
    org = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 1.6 - 0.8) + jnp.asarray(
        [0, 1, 0], jnp.float32
    )
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    hp = pk.closest_hit_pallas(tris12, org, d, 0.0, BIG)
    hx = closest_hit(scene.bvh, org, d, 0.0, BIG)
    np.testing.assert_array_equal(np.asarray(hp.prim_id), np.asarray(hx.prim_id))
    m = np.asarray(hx.prim_id >= 0)
    np.testing.assert_allclose(
        np.asarray(hp.t)[m], np.asarray(hx.t)[m], rtol=1e-4
    )


def test_chunked_kernel_matches_bvh():
    """Chunked block-culling kernel (ops/pallas_chunked.py) vs the BVH
    reference path, including active-lane masking."""
    from imbatracer_tpu.ops import pallas_chunked as pc

    def run():
        scene, _ = make_cornell_scene()
        rs = np.random.RandomState(9)
        n = 1024
        org = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 1.6 - 0.8) + jnp.asarray(
            [0, 1, 0], jnp.float32
        )
        d = jnp.asarray(rs.randn(n, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        active = jnp.asarray(rs.rand(n) < 0.8)

        hp = pc.closest_hit_chunked(
            scene.bvh.sbox, scene.bvh.cbox, scene.bvh.tris12, org, d, 0.0,
            BIG, active=active,
        )
        hx = closest_hit(scene.bvh, org, d, 0.0, BIG, active=active)
        np.testing.assert_array_equal(np.asarray(hp.prim_id), np.asarray(hx.prim_id))
        m = np.asarray(hx.prim_id >= 0)
        np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m], rtol=1e-4)

        from imbatracer_tpu.render.traverse import any_hit

        occ_p = pc.any_hit_chunked(
            scene.bvh.sbox, scene.bvh.cbox, scene.bvh.tris12, org, d, 0.0,
            jnp.full((n,), 2.0), active=active,
        )
        occ_x = any_hit(scene.bvh, org, d, 0.0, jnp.full((n,), 2.0), active=active)
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))

    if jax.default_backend() == "cpu":
        import jax.experimental.pallas as pl
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        pc.pl.pallas_call = interp
        try:
            run()
        finally:
            pl.pallas_call = orig
            pc.pl.pallas_call = orig
    else:
        run()
