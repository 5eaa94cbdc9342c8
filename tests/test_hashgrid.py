"""Hash-grid kNN vs brute force (SURVEY.md §4: "hash-grid kNN vs brute
force" unit layer)."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render.hashgrid import build_hash_grid, query_knn

TABLE = 1024


def _brute_knn(photons, q, radius, k):
    d2 = ((photons[None, :, :] - q[:, None, :]) ** 2).sum(-1)
    d2 = np.where(d2 <= radius * radius, d2, np.inf)
    order = np.argsort(d2, axis=1)[:, :k]
    dist = np.take_along_axis(d2, order, axis=1)
    idx = np.where(np.isfinite(dist), order, -1)
    return idx, dist


def test_knn_matches_brute_force():
    rs = np.random.RandomState(0)
    photons = rs.rand(4000, 3).astype(np.float32)
    valid = np.ones(4000, bool)
    q = rs.rand(256, 3).astype(np.float32)
    radius = 0.05
    k = 8

    grid = build_hash_grid(jnp.asarray(photons), jnp.asarray(valid),
                           jnp.float32(radius), TABLE)
    idx, d2, count = query_knn(grid, jnp.asarray(q), k, 64, TABLE)
    bidx, bd2 = _brute_knn(photons, q, radius, k)

    idx, d2, count = np.asarray(idx), np.asarray(d2), np.asarray(count)
    bcount = np.isfinite(bd2).sum(1)
    np.testing.assert_array_equal(count, bcount)
    # Distances of found neighbours must match exactly (same photons).
    for r in range(q.shape[0]):
        n = count[r]
        np.testing.assert_allclose(d2[r, :n], bd2[r, :n], rtol=1e-5)
        assert set(idx[r, :n]) == set(bidx[r, :n])


def test_knn_respects_validity_and_radius():
    rs = np.random.RandomState(1)
    photons = rs.rand(1000, 3).astype(np.float32)
    valid = np.zeros(1000, bool)
    valid[:500] = True
    q = photons[:32] + 1e-4  # near valid photons
    grid = build_hash_grid(jnp.asarray(photons), jnp.asarray(valid),
                           jnp.float32(0.02), TABLE)
    idx, d2, count = query_knn(grid, jnp.asarray(q), 4, 64, TABLE)
    idx = np.asarray(idx)
    assert (idx[np.asarray(count) > 0] < 500).all() or (
        idx[idx >= 0] < 500
    ).all(), "invalid photons leaked into results"
    assert (np.asarray(d2)[idx >= 0] <= 0.02 * 0.02 + 1e-7).all()


def test_knn_empty_grid():
    photons = np.zeros((16, 3), np.float32)
    valid = np.zeros(16, bool)
    grid = build_hash_grid(jnp.asarray(photons), jnp.asarray(valid),
                           jnp.float32(0.1), TABLE)
    idx, d2, count = query_knn(grid, jnp.zeros((8, 3)), 4, 16, TABLE)
    assert (np.asarray(count) == 0).all()
    assert (np.asarray(idx) == -1).all()
