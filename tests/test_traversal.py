"""Traversal-mode equivalence tests."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.traverse import any_hit, closest_hit

def test_dense_chunked_matches_loop():
    """Chunked-loop dense mode (mode "densel") vs the skip-link loop on
    a mid-size scene, closest + occlusion + active masks + non-chunk-
    multiple triangle counts."""
    import numpy as np
    from imbatracer_tpu.accel.device import DeviceBvh
    from imbatracer_tpu.render.traverse import _dense_chunked
    from imbatracer_tpu.scene.procedural import make_big_scene

    scene, _ = make_big_scene(num_boxes=150, seed=9)   # ~1.8k tris
    bvh = scene.bvh
    rs = np.random.RandomState(31)
    n = 2048
    org = jnp.asarray(np.stack(
        [rs.uniform(-30, 30, n), rs.uniform(1, 10, n),
         rs.uniform(-30, 30, n)], -1), jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    act = jnp.asarray(rs.rand(n) < 0.8)

    hx = closest_hit(bvh, org, d, 0.0, BIG, active=act)
    hd = _dense_chunked(bvh, org, d, 0.0, BIG, act, None, True)
    tp, tx = np.asarray(hd.t), np.asarray(hx.t)
    pid_d, pid_x = np.asarray(hd.prim_id), np.asarray(hx.prim_id)
    tie = (pid_d != pid_x) & (pid_d >= 0) & (pid_x >= 0) & (tp == tx)
    assert ((pid_d == pid_x) | tie).all()
    m = (pid_x >= 0) & ~tie
    np.testing.assert_allclose(tp[m], tx[m], rtol=1e-4)

    od = _dense_chunked(bvh, org, d, 0.0, jnp.full((n,), 8.0), act, None,
                        False)
    ox_ = any_hit(bvh, org, d, 0.0, jnp.full((n,), 8.0), active=act)
    np.testing.assert_array_equal(np.asarray(od), np.asarray(ox_))


def test_vmem_sorted_dispatch_exact(monkeypatch):
    """The octant-sorted vmem dispatch (pallas_vmem._sorted_vmem_call)
    must be bit-identical to the unsorted kernel — sorting is purely a
    block-coherence knob (round-5; scattered batches measured 3.4x
    coherent cost unsorted, results/r5_qrow_split.txt).  Runs the Mosaic
    kernel in interpret mode with a forced vmem-layout BVH."""
    from imbatracer_tpu.ops import pallas_vmem as pv
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    monkeypatch.setenv("IMBA_BVH_MODE", "vmem")
    monkeypatch.setattr(pv, "INTERPRET", True)
    scene, _ = make_cornell_scene()
    bvh = scene.bvh
    assert bvh.mode == "vmem" and bvh.sbox is not None

    rs = np.random.RandomState(3)
    n = 1024
    org = jnp.asarray(rs.uniform(-0.8, 0.8, (n, 3)), jnp.float32)
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    act = jnp.asarray(rs.rand(n) > 0.1)

    h0 = closest_hit(bvh, org, d, 0.0, BIG, active=act, sort=False)
    h1 = closest_hit(bvh, org, d, 0.0, BIG, active=act, sort=True)
    for f in ("t", "prim_id", "u", "v"):
        np.testing.assert_array_equal(np.asarray(getattr(h0, f)),
                                      np.asarray(getattr(h1, f)))
    tmax = jnp.full((n,), 0.7, jnp.float32)
    a0 = any_hit(bvh, org, d, 0.0, tmax, active=act, sort=False)
    a1 = any_hit(bvh, org, d, 0.0, tmax, active=act, sort=True)
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    assert 0.0 < float(np.asarray(a0).mean()) < 1.0
