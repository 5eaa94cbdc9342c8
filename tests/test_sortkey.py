"""Chunk-first ray sort key (IMBA_SORT_KEY=chunk): the per-ray nearest
candidate super-chunk must match a NumPy slab reference, and the sorted
stream dispatch must return identical hits under either key (any
permutation is exact — the key is purely a coherence knob).

Reference role: ray sorting for incoherent batches plays the part of the
reference's RayQueue compaction/material sort (ray_queue.h:145-221)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.ops import pallas_stream as ps


def _interp(fn):
    import jax.experimental.pallas as pl

    if jax.default_backend() != "cpu":
        return fn()
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl.pallas_call = interp
    ps.pl.pallas_call = interp
    try:
        return fn()
    finally:
        pl.pallas_call = orig
        ps.pl.pallas_call = orig


def test_first_chunk_matches_numpy():
    rs = np.random.RandomState(5)
    num_s, num_r = 21, 256
    lo = rs.uniform(-10, 8, (num_s, 3)).astype(np.float32)
    hi = lo + rs.uniform(0.5, 4.0, (num_s, 3)).astype(np.float32)
    sbox = np.concatenate([lo, hi, np.zeros((num_s, 2), np.float32)], 1)
    org = rs.uniform(-12, 12, (num_r, 3)).astype(np.float32)
    d = rs.randn(num_r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    tmin = np.zeros(num_r, np.float32)
    tmax = np.full(num_r, 1e30, np.float32)
    act = rs.rand(num_r) < 0.9

    got = np.asarray(
        ps.first_chunk(jnp.asarray(org), jnp.asarray(d), jnp.asarray(tmin),
                       jnp.asarray(tmax), jnp.asarray(act),
                       jnp.asarray(sbox)))

    # NumPy mirror of ps._safe_inv.
    inv = (np.where(d >= 0.0, 1.0, -1.0)
           / np.maximum(np.abs(d), 1e-12)).astype(np.float32)
    want = np.full(num_r, num_s, np.int32)
    for r in range(num_r):
        if not act[r]:
            continue
        best_t, best_c = 1e30, num_s
        for s in range(num_s):
            t0 = (lo[s] - org[r]) * inv[r]
            t1 = (hi[s] - org[r]) * inv[r]
            tn = np.max(np.minimum(t0, t1))
            tf = np.min(np.maximum(t0, t1))
            if tn <= tf and tf >= tmin[r] and tn <= tmax[r]:
                key = max(tn, 0.0)
                if key < best_t:
                    best_t, best_c = key, s
        want[r] = best_c
    np.testing.assert_array_equal(got, want)


def test_chunk_key_sorted_exact():
    # >1024 packed tris => multiple super-chunks, so the chunk key is
    # non-degenerate.  Identical hits vs the morton key are the contract.
    rs = np.random.RandomState(7)
    tris = []
    for _ in range(1300):
        a = rs.uniform(-20, 20, 3).astype(np.float32)
        a[1] = rs.uniform(0, 6)
        tris.append((a, a + rs.uniform(-1.5, 1.5, 3).astype(np.float32),
                     a + rs.uniform(-1.5, 1.5, 3).astype(np.float32)))
    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    lo, hi = triangle_bboxes(v0, v1, v2)
    t = thread_bvh(build_bvh(lo, hi), v0, v1, v2)
    sbox, tiles, center = ps.pack_stream_tiles(t.tri_v0, t.tri_e1,
                                               t.tri_e2, t.tri_id)
    assert sbox.shape[0] > 1, "fixture must span multiple super-chunks"

    n = 1024
    org = np.stack([rs.uniform(-18, 18, n), rs.uniform(0.5, 5.5, n),
                    rs.uniform(-18, 18, n)], 1).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    org = org - center

    def run():
        return ps.closest_hit_sorted(jnp.asarray(sbox), jnp.asarray(tiles),
                                     jnp.asarray(org), jnp.asarray(d),
                                     0.0, ps.BIG)

    os.environ["IMBA_SORT_KEY"] = "chunk"
    try:
        h_c = _interp(run)
    finally:
        os.environ.pop("IMBA_SORT_KEY")
    h_m = _interp(run)

    np.testing.assert_array_equal(np.asarray(h_c.prim_id),
                                  np.asarray(h_m.prim_id))
    np.testing.assert_array_equal(np.asarray(h_c.t), np.asarray(h_m.t))
    assert int(jnp.sum(h_m.prim_id >= 0)) > 100  # scene actually hit
