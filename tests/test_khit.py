"""K-nearest-hit kernel (ops/pallas_khit.py): the returned 4 hits must be
exactly the 4 nearest intersections in (tmin, tmax) — the gap-free
contract the exact masked re-trace (traverse._closest_hit_masked_khit)
builds on."""

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.ops import pallas_stream as ps
from imbatracer_tpu.ops.pallas_khit import K, khit_sorted


def _interp(fn):
    import jax.experimental.pallas as pl

    if jax.default_backend() != "cpu":
        return fn()
    orig = pl.pallas_call

    def interp(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    pl.pallas_call = interp
    try:
        return fn()
    finally:
        pl.pallas_call = orig


def _brute_hits(v0, v1, v2, org, d, tmin, tmax):
    """All (ray, tri) intersection ts, BIG where none."""
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    res = np.full((org.shape[0], v0.shape[0]), 1e30, np.float64)
    for r in range(org.shape[0]):
        o, dd = org[r].astype(np.float64), d[r].astype(np.float64)
        det = -(dd @ n.T)
        c = np.cross(o, dd)
        u_num = c @ e2.T + dd @ np.cross(v0, e2).T
        v_num = -(c @ e1.T) + dd @ np.cross(e1, v0).T
        t_num = o @ n.T - (v0 * n).sum(-1)
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / det)
        t = t_num * inv
        u = u_num * inv
        v = v_num * inv
        ok = ((inv != 0) & (u >= 0) & (v >= 0) & (u + v <= 1)
              & (t > tmin) & (t < tmax))
        res[r] = np.where(ok, t, 1e30)
    return res


def test_khit_matches_brute_force():
    rs = np.random.RandomState(11)
    # Stacked parallel quads => many rays cross 5+ surfaces.
    tris = []
    for k in range(8):
        y = 0.5 + 0.5 * k
        tris += [((-2, y, 2), (2, y, 2), (2, y, -2)),
                 ((-2, y, 2), (2, y, -2), (-2, y, -2))]
    for _ in range(60):  # plus random clutter
        a = rs.uniform(-2, 2, 3)
        tris.append((a, a + rs.uniform(-0.5, 0.5, 3),
                     a + rs.uniform(-0.5, 0.5, 3)))
    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    lo, hi = triangle_bboxes(v0, v1, v2)
    t = thread_bvh(build_bvh(lo, hi), v0, v1, v2)
    sbox, tiles, center = ps.pack_stream_tiles(t.tri_v0, t.tri_e1,
                                               t.tri_e2, t.tri_id)

    n = 64
    org = np.stack([rs.uniform(-1.8, 1.8, n),
                    np.full(n, 8.0, np.float32),
                    rs.uniform(-1.8, 1.8, n)], axis=1).astype(np.float32)
    d = np.tile(np.asarray([[0.0, -1.0, 0.0]], np.float32), (n, 1))
    d[n // 2:] = rs.randn(n - n // 2, 3).astype(np.float32)
    d[n // 2:] /= np.linalg.norm(d[n // 2:], axis=1, keepdims=True)

    def run():
        return khit_sorted(jnp.asarray(sbox), jnp.asarray(tiles),
                           jnp.asarray(org - center), jnp.asarray(d),
                           0.0, 1e30)

    t4, u4, v4, id4 = map(np.asarray, _interp(run))

    all_t = _brute_hits(v0, v1, v2, org, d, 0.0, 1e30)
    want = np.sort(all_t, axis=1)[:, :K]
    got = np.where(id4 >= 0, t4, 1e30)
    have = want < 1e30
    np.testing.assert_allclose(got[have], want[have], rtol=2e-4)
    assert ((id4 >= 0) == have).all()
    # Sanity: the stacked-quad rays really exercised >K surfaces.
    assert (np.sum(all_t < 1e30, axis=1) > K).any()


def test_khit_respects_active_and_tmin():
    tris = [((-2, 1, 2), (2, 1, 2), (2, 1, -2)),
            ((-2, 1, 2), (2, 1, -2), (-2, 1, -2)),
            ((-2, 3, 2), (2, 3, 2), (2, 3, -2)),
            ((-2, 3, 2), (2, 3, -2), (-2, 3, -2))]
    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    lo, hi = triangle_bboxes(v0, v1, v2)
    t = thread_bvh(build_bvh(lo, hi), v0, v1, v2)
    sbox, tiles, center = ps.pack_stream_tiles(t.tri_v0, t.tri_e1,
                                               t.tri_e2, t.tri_id)
    # x/z offset keeps the ray off the quads' shared diagonal (a ray ON
    # the edge legitimately hits both triangles at the same t — MT's
    # inclusive bounds — and would consume two slots).
    org = jnp.asarray(np.tile([[0.3, 8.0, 0.2]], (4, 1)).astype(np.float32)
                      - center)
    d = jnp.asarray(np.tile([[0.0, -1.0, 0.0]], (4, 1)).astype(np.float32))
    tmin = jnp.asarray([0.0, 6.0, 0.0, 0.0], jnp.float32)  # lane1 skips y=3
    act = jnp.asarray([True, True, False, True])

    def run():
        return khit_sorted(jnp.asarray(sbox), jnp.asarray(tiles), org, d,
                           tmin, 1e30, active=act)

    t4, _, _, id4 = map(np.asarray, _interp(run))
    np.testing.assert_allclose(t4[0, :2], [5.0, 7.0], rtol=1e-5)
    assert id4[0, 2] < 0
    np.testing.assert_allclose(t4[1, 0], 7.0, rtol=1e-5)  # past tmin=6
    assert id4[1, 1] < 0
    assert (id4[2] < 0).all()          # inactive lane: no hits
    np.testing.assert_allclose(t4[3, :2], [5.0, 7.0], rtol=1e-5)
