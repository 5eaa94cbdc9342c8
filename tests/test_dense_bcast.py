"""Broadcast-dense traversal (traverse._dense_bcast, IMBA_DENSE2_MAX):
the (R, T) fused exhaustive MT must agree with the reference threaded
walk (xla route) on closest hits and occlusion.  Epsilon-boundary pairs
can differ between the plane pass and the winner recompute (different
XLA contraction choices), so agreement is statistical-with-floor, the
same bar the vmem kernel tests use."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes
from imbatracer_tpu.accel.device import DeviceBvh
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.render import traverse as tr
from imbatracer_tpu.render.intersect import BIG


def _scene(num_tris=900, seed=3):
    rs = np.random.RandomState(seed)
    base = rs.rand(num_tris, 3).astype(np.float32) * 4.0
    v0 = base
    v1 = base + rs.rand(num_tris, 3).astype(np.float32) * 0.4
    v2 = base + rs.rand(num_tris, 3).astype(np.float32) * 0.4
    lo, hi = triangle_bboxes(v0, v1, v2)
    t = thread_bvh(build_bvh(lo, hi), v0, v1, v2)
    return (DeviceBvh.from_threaded(t, mode="vmem"),
            DeviceBvh.from_threaded(t, mode="xla"))


def _rays(num_r=2048, seed=11):
    rs = np.random.RandomState(seed)
    org = jnp.asarray(rs.rand(num_r, 3) * 4.0, jnp.float32)
    d = rs.randn(num_r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, jnp.asarray(d)


def test_dense_bcast_matches_xla(monkeypatch):
    monkeypatch.setenv("IMBA_DENSE2_MAX", "100000")
    vmem, xla = _scene()
    org, d = _rays()
    a = tr.closest_hit(vmem, org, d, 0.0, BIG)     # -> _dense_bcast
    b = tr.closest_hit(xla, org, d, 0.0, BIG)
    ida, idb = np.asarray(a.prim_id), np.asarray(b.prim_id)
    same = ida == idb
    assert same.mean() > 0.999, f"id agreement {same.mean():.4f}"
    np.testing.assert_allclose(np.asarray(a.t)[same], np.asarray(b.t)[same],
                               rtol=1e-5, atol=1e-6)
    assert (ida >= 0).sum() > 100  # fixture actually hits things


def test_dense_bcast_any_hit(monkeypatch):
    monkeypatch.setenv("IMBA_DENSE2_MAX", "100000")
    vmem, xla = _scene()
    org, d = _rays(seed=12)
    occ_a = np.asarray(tr.any_hit(vmem, org, d, 1e-3, 2.0))
    occ_b = np.asarray(tr.any_hit(xla, org, d, 1e-3, 2.0))
    agree = (occ_a == occ_b).mean()
    assert agree > 0.999, f"occlusion agreement {agree:.4f}"
    assert occ_a.sum() > 50


def test_dense_bcast_respects_active_and_bounds(monkeypatch):
    monkeypatch.setenv("IMBA_DENSE2_MAX", "100000")
    vmem, _ = _scene()
    org, d = _rays(seed=13)
    act = np.zeros(org.shape[0], bool)
    act[::2] = True
    hit = tr.closest_hit(vmem, org, d, 0.0, BIG, active=jnp.asarray(act))
    assert (np.asarray(hit.prim_id)[~act] == -1).all()
    # tmax clipping: nothing beyond 0.1 for a shrunken window
    h2 = tr.closest_hit(vmem, org, d, 0.0, 0.1)
    t2 = np.asarray(h2.t)
    assert ((t2 < 0.1) | (t2 >= BIG)).all()
