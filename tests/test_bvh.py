"""BVH build + traversal correctness vs brute force (SURVEY.md §4:
"BVH validity ... hash-grid kNN vs brute force" unit layer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes, validate_bvh
from imbatracer_tpu.accel.device import DeviceBvh
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.render.intersect import BIG, brute_force_closest_hit
from imbatracer_tpu.render.traverse import any_hit, closest_hit


def _random_tris(n, rs, spread=10.0, size=0.6):
    base = (rs.rand(n, 3).astype(np.float32) - 0.5) * spread
    v0 = base + rs.randn(n, 3).astype(np.float32) * size
    v1 = base + rs.randn(n, 3).astype(np.float32) * size
    v2 = base + rs.randn(n, 3).astype(np.float32) * size
    return v0, v1, v2


def _random_rays(n, rs, spread=14.0):
    org = (rs.rand(n, 3).astype(np.float32) - 0.5) * spread
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return org, d


@pytest.mark.parametrize("n_tris", [1, 7, 200, 3000])
def test_bvh_structure(n_tris):
    rs = np.random.RandomState(n_tris)
    v0, v1, v2 = _random_tris(n_tris, rs)
    lo, hi = triangle_bboxes(v0, v1, v2)
    nodes = build_bvh(lo, hi)
    validate_bvh(nodes, lo, hi)
    tb = thread_bvh(nodes, v0, v1, v2)
    # Every primitive appears exactly once in the packed packets.
    ids = tb.tri_id[tb.tri_id >= 0]
    assert sorted(ids.tolist()) == list(range(n_tris))
    # Links are in range and the root's miss link terminates.
    n = tb.hit_link.shape[0]
    assert tb.miss_link[0] == -1
    assert np.all(tb.hit_link < n) and np.all(tb.miss_link < n)


@pytest.mark.parametrize("n_tris,n_rays", [(1, 64), (50, 256), (2000, 512)])
def test_closest_hit_matches_brute_force(n_tris, n_rays):
    rs = np.random.RandomState(n_tris * 7 + 1)
    v0, v1, v2 = _random_tris(n_tris, rs)
    lo, hi = triangle_bboxes(v0, v1, v2)
    bvh = DeviceBvh.from_threaded(thread_bvh(build_bvh(lo, hi), v0, v1, v2))
    org, d = _random_rays(n_rays, rs)

    hit = closest_hit(bvh, jnp.asarray(org), jnp.asarray(d), 0.0, BIG)
    e1, e2 = v1 - v0, v2 - v0
    bt, bid, bu, bv = brute_force_closest_hit(
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
    )

    np.testing.assert_array_equal(np.asarray(hit.prim_id >= 0), np.asarray(bid >= 0))
    hit_mask = np.asarray(bid >= 0)
    if not hit_mask.any():
        return
    # Distances agree (ties in prim id are possible at shared edges).
    np.testing.assert_allclose(
        np.asarray(hit.t)[hit_mask], np.asarray(bt)[hit_mask], rtol=1e-4, atol=1e-5
    )
    same = np.asarray(hit.prim_id) == np.asarray(bid)
    assert same[hit_mask].mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(hit.u)[same & hit_mask], np.asarray(bu)[same & hit_mask], atol=1e-3
    )


def test_any_hit_matches_brute_force():
    rs = np.random.RandomState(5)
    v0, v1, v2 = _random_tris(300, rs)
    lo, hi = triangle_bboxes(v0, v1, v2)
    bvh = DeviceBvh.from_threaded(thread_bvh(build_bvh(lo, hi), v0, v1, v2))
    org, d = _random_rays(512, rs)

    e1, e2 = v1 - v0, v2 - v0
    bt, bid, _, _ = brute_force_closest_hit(
        jnp.asarray(org), jnp.asarray(d), jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)
    )
    tmax = jnp.full((512,), 8.0)
    occ = any_hit(bvh, jnp.asarray(org), jnp.asarray(d), 0.0, tmax)
    expected = np.asarray((bid >= 0) & (bt < 8.0))
    np.testing.assert_array_equal(np.asarray(occ), expected)


def test_tmax_respected():
    # A single triangle at z=-5; rays from origin along -z with short tmax miss.
    v0 = np.array([[-1, -1, -5]], np.float32)
    v1 = np.array([[1, -1, -5]], np.float32)
    v2 = np.array([[0, 1, -5]], np.float32)
    lo, hi = triangle_bboxes(v0, v1, v2)
    bvh = DeviceBvh.from_threaded(thread_bvh(build_bvh(lo, hi), v0, v1, v2))
    org = jnp.zeros((2, 3))
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    hit = closest_hit(bvh, org, d, 0.0, jnp.asarray([4.0, 6.0]))
    assert int(hit.prim_id[0]) == -1
    assert int(hit.prim_id[1]) == 0
    np.testing.assert_allclose(float(hit.t[1]), 5.0, rtol=1e-5)
