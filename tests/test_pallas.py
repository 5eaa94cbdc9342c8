"""Pallas traversal kernels vs the XLA skip-link reference path (runs in
interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.ops import pallas_intersect as pk
from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.traverse import closest_hit, any_hit
from imbatracer_tpu.scene.procedural import make_big_scene, make_cornell_scene


def _interp(module, fn):
    """Run fn with pallas_call forced to interpreter mode on CPU."""
    if jax.default_backend() != "cpu":
        return fn()
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl.pallas_call = interp
    module.pl.pallas_call = interp
    try:
        return fn()
    finally:
        pl.pallas_call = orig
        module.pl.pallas_call = orig


def test_pallas_dense_matches_bvh():
    def run():
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

    _interp(pk, run)


def test_stream_kernel_matches_bvh():
    """HBM-streamed traversal (ops/pallas_stream.py) vs the skip-link
    loop, including active-lane masking and per-ray tmax."""
    from imbatracer_tpu.ops import pallas_stream as ps

    def run():
        scene, _ = make_cornell_scene()
        sbox, tiles, center = ps.pack_stream_tiles(
            np.asarray(scene.bvh.tri_v0), np.asarray(scene.bvh.tri_e1),
            np.asarray(scene.bvh.tri_e2), np.asarray(scene.bvh.tri_id),
        )
        sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
        rs = np.random.RandomState(9)
        n = 1024
        org = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 1.6 - 0.8) + jnp.asarray(
            [0, 1, 0], jnp.float32
        )
        d = jnp.asarray(rs.randn(n, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        active = jnp.asarray(rs.rand(n) < 0.8)

        org_c = org - jnp.asarray(center)[None, :]
        hp = ps.closest_hit_stream(sboxj, tilesj, org_c, d, 0.0, BIG,
                                   active=active)
        hx = closest_hit(scene.bvh, org, d, 0.0, BIG, active=active)
        np.testing.assert_array_equal(
            np.asarray(hp.prim_id), np.asarray(hx.prim_id)
        )
        m = np.asarray(hx.prim_id >= 0)
        np.testing.assert_allclose(np.asarray(hp.t)[m], np.asarray(hx.t)[m],
                                   rtol=1e-4)

        occ_p = ps.any_hit_stream(sboxj, tilesj, org_c, d, 0.0,
                                  jnp.full((n,), 2.0), active=active)
        occ_x = any_hit(scene.bvh, org, d, 0.0, jnp.full((n,), 2.0),
                        active=active)
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))

    _interp(ps, run)


def test_pairs_kernel_matches_bvh():
    """Pair-stream traversal (ops/pallas_pairs.py) vs the skip-link loop:
    incoherent rays, closest + occlusion, including the two-pass early
    termination and per-super-chunk block padding."""
    from imbatracer_tpu.ops import pallas_pairs as pp
    from imbatracer_tpu.ops import pallas_stream as ps

    def run():
        scene, _ = make_cornell_scene()
        sbox, tiles, center = ps.pack_stream_tiles(
            np.asarray(scene.bvh.tri_v0), np.asarray(scene.bvh.tri_e1),
            np.asarray(scene.bvh.tri_e2), np.asarray(scene.bvh.tri_id),
        )
        sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
        rs = np.random.RandomState(17)
        n = 1024
        org = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 1.6 - 0.8) + jnp.asarray(
            [0, 1, 0], jnp.float32
        )
        d = jnp.asarray(rs.randn(n, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        active = jnp.asarray(rs.rand(n) < 0.8)
        org_c = org - jnp.asarray(center)[None, :]

        hp = pp.closest_hit_pairs(sboxj, tilesj, org_c, d, 0.0, BIG,
                                  active=active)
        hx = closest_hit(scene.bvh, org, d, 0.0, BIG, active=active)
        pid_p = np.asarray(hp.prim_id)
        pid_x = np.asarray(hx.prim_id)
        tp, tx = np.asarray(hp.t), np.asarray(hx.t)
        # Rays hitting a shared edge tie at identical t; either triangle
        # is a correct answer and tie-break order differs from the loop.
        tie = (pid_p != pid_x) & (pid_p >= 0) & (pid_x >= 0) & (tp == tx)
        agree = (pid_p == pid_x) | tie
        assert agree.all(), np.where(~agree)[0]
        m = (pid_x >= 0) & ~tie
        np.testing.assert_allclose(tp[m], tx[m], rtol=1e-4)

        occ_p = pp.any_hit_pairs(sboxj, tilesj, org_c, d, 0.0,
                                 jnp.full((n,), 2.0), active=active)
        occ_x = any_hit(scene.bvh, org, d, 0.0, jnp.full((n,), 2.0),
                        active=active)
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))

    def _interp2(fn):
        if jax.default_backend() != "cpu":
            return fn()
        import jax.experimental.pallas as pl
        from imbatracer_tpu.ops import pallas_pairs as pp
        from imbatracer_tpu.ops import pallas_stream as ps
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        pp.pl.pallas_call = interp
        ps.pl.pallas_call = interp
        try:
            return fn()
        finally:
            pl.pallas_call = orig
            pp.pl.pallas_call = orig
            ps.pl.pallas_call = orig

    _interp2(run)


def test_pairs_saturation_fallback_exact():
    """Rays with more true candidates than the top-K cap must still be
    EXACT: the compacted stream fallback re-traces them (round-3 pairs
    routing is on by default, so this is a correctness gate)."""
    import numpy as np
    from imbatracer_tpu.ops import pallas_pairs as pp
    from imbatracer_tpu.ops import pallas_stream as ps

    def run():
        sys_path_scene = make_big_scene(num_boxes=120, seed=4)[0]
        bvh = sys_path_scene.bvh
        sbox, tiles, center = ps.pack_stream_tiles(
            np.asarray(bvh.tri_v0), np.asarray(bvh.tri_e1),
            np.asarray(bvh.tri_e2), np.asarray(bvh.tri_id))
        sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
        assert sbox.shape[0] > 2, "fixture needs multiple super-chunks"

        rs = np.random.RandomState(23)
        n = 512
        org = np.stack([rs.uniform(-30, 30, n), rs.uniform(1, 10, n),
                        rs.uniform(-30, 30, n)], -1).astype(np.float32)
        d = rs.randn(n, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        org, d = jnp.asarray(org), jnp.asarray(d)
        org_c = org - jnp.asarray(center)[None, :]

        # k_max=1 saturates most rays -> exercises the fallback heavily.
        hp = pp.closest_hit_pairs(sboxj, tilesj, org_c, d, 0.0, BIG,
                                  k_max=1)
        hx = closest_hit(sys_path_scene.bvh, org, d, 0.0, BIG)
        tp, tx = np.asarray(hp.t), np.asarray(hx.t)
        pid_p, pid_x = np.asarray(hp.prim_id), np.asarray(hx.prim_id)
        tie = (pid_p != pid_x) & (pid_p >= 0) & (pid_x >= 0) & (tp == tx)
        agree = (pid_p == pid_x) | tie
        assert agree.all(), np.where(~agree)[0][:10]

        occ_p = pp.any_hit_pairs(sboxj, tilesj, org_c, d, 0.0,
                                 jnp.full((n,), 8.0), k_max=1)
        occ_x = any_hit(sys_path_scene.bvh, org, d, 0.0,
                        jnp.full((n,), 8.0))
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))

        # 2-pass early-termination schedule must agree too.
        pp.PASSES = 2
        try:
            h2p = pp.closest_hit_pairs(sboxj, tilesj, org_c, d, 0.0, BIG,
                                       k_max=2)
        finally:
            pp.PASSES = 1
        t2, p2 = np.asarray(h2p.t), np.asarray(h2p.prim_id)
        tie2 = (p2 != pid_x) & (p2 >= 0) & (pid_x >= 0) & (t2 == tx)
        assert ((p2 == pid_x) | tie2).all(), np.where(~((p2 == pid_x) | tie2))[0][:10]

    def _interp3(fn):
        if jax.default_backend() != "cpu":
            return fn()
        import jax.experimental.pallas as pl
        from imbatracer_tpu.ops import pallas_pairs as pp
        from imbatracer_tpu.ops import pallas_stream as ps
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        pp.pl.pallas_call = interp
        ps.pl.pallas_call = interp
        try:
            return fn()
        finally:
            pl.pallas_call = orig
            pp.pl.pallas_call = orig
            ps.pl.pallas_call = orig

    _interp3(run)


def test_vmem_kernel_matches_bvh():
    """VMEM-resident small-scene kernel (ops/pallas_vmem.py) vs the
    skip-link loop: incoherent rays, closest + occlusion + actives."""
    from imbatracer_tpu.ops import pallas_stream as ps
    from imbatracer_tpu.ops import pallas_vmem as pv

    def run():
        scene, _ = make_cornell_scene()
        sbox, tiles, center = ps.pack_stream_tiles(
            np.asarray(scene.bvh.tri_v0), np.asarray(scene.bvh.tri_e1),
            np.asarray(scene.bvh.tri_e2), np.asarray(scene.bvh.tri_id),
        )
        sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
        rs = np.random.RandomState(29)
        n = 1024
        org = jnp.asarray(rs.rand(n, 3).astype(np.float32) * 1.6 - 0.8
                          ) + jnp.asarray([0, 1, 0], jnp.float32)
        d = jnp.asarray(rs.randn(n, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        active = jnp.asarray(rs.rand(n) < 0.8)
        org_c = org - jnp.asarray(center)[None, :]

        hp = pv.closest_hit_vmem(sboxj, tilesj, org_c, d, 0.0, BIG,
                                 active=active)
        hx = closest_hit(scene.bvh, org, d, 0.0, BIG, active=active)
        tp, tx = np.asarray(hp.t), np.asarray(hx.t)
        pid_p, pid_x = np.asarray(hp.prim_id), np.asarray(hx.prim_id)
        tie = (pid_p != pid_x) & (pid_p >= 0) & (pid_x >= 0) & (tp == tx)
        assert ((pid_p == pid_x) | tie).all()
        m = (pid_x >= 0) & ~tie
        np.testing.assert_allclose(tp[m], tx[m], rtol=1e-4)

        occ_p = pv.any_hit_vmem(sboxj, tilesj, org_c, d, 0.0,
                                jnp.full((n,), 2.0), active=active)
        occ_x = any_hit(scene.bvh, org, d, 0.0, jnp.full((n,), 2.0),
                        active=active)
        np.testing.assert_array_equal(np.asarray(occ_p), np.asarray(occ_x))

    def _interp4(fn):
        if jax.default_backend() != "cpu":
            return fn()
        import jax.experimental.pallas as pl
        from imbatracer_tpu.ops import pallas_vmem as pv
        orig = pl.pallas_call

        def interp(*a, **k):
            k.setdefault("interpret", True)
            return orig(*a, **k)

        pl.pallas_call = interp
        pv.pl.pallas_call = interp
        try:
            return fn()
        finally:
            pl.pallas_call = orig
            pv.pl.pallas_call = orig

    _interp4(run)
