"""Pallas merge kernel (ops/pallas_merge.py) vs a brute-force reference.

Runs the kernel in interpreter mode (tests are CPU-only); the reference
is the *unbounded* in-radius accumulation with the same estimator math
as vcm._vertex_merging, evaluated through the real materials module —
the kernel inlines those formulas in component form, so this checks the
inlining, the cell-join completeness (every in-radius photon is found
exactly once), and the MIS weighting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.ops import pallas_merge
from imbatracer_tpu.render import materials as mat_mod


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _make_queries(rs, num_q, kinds):
    qpos = rs.rand(num_q, 3).astype(np.float32)
    n = _normalize(rs.randn(num_q, 3)).astype(np.float32)
    # geometric normal: small perturbation of n (keeps frames realistic)
    gn = _normalize(n + 0.1 * rs.randn(num_q, 3)).astype(np.float32)
    w_out = _normalize(rs.randn(num_q, 3)).astype(np.float32)
    kind = rs.choice(kinds, num_q).astype(np.int32)
    params = mat_mod.MatParams(
        kind=jnp.asarray(kind),
        kd=jnp.asarray(rs.rand(num_q, 3), jnp.float32),
        ks=jnp.asarray(rs.rand(num_q, 3), jnp.float32),
        tf=jnp.zeros((num_q, 3), jnp.float32),
        ns=jnp.asarray(1.0 + rs.rand(num_q) * 30.0, jnp.float32),
        ior=jnp.full((num_q,), 1.5, jnp.float32),
        emit=jnp.zeros((num_q, 3), jnp.float32),
        kd_tex=jnp.full((num_q,), -1, jnp.int32),
        bump_tex=jnp.full((num_q,), -1, jnp.int32),
        mask_tex=jnp.full((num_q,), -1, jnp.int32),
    )
    d_vcm = jnp.asarray(rs.rand(num_q) * 2.0, jnp.float32)
    d_vm = jnp.asarray(rs.rand(num_q) * 2.0, jnp.float32)
    active = jnp.asarray(rs.rand(num_q) > 0.15)
    return (jnp.asarray(qpos), jnp.asarray(n), jnp.asarray(gn),
            jnp.asarray(w_out), params, d_vcm, d_vm, active)


def _ref_merge(qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
               ppos, pvalid, p_win, p_tp, p_dvcm, p_dvm,
               radius, eta_vc, ppm):
    """Unbounded in-radius walk through the real materials module."""
    num_p = ppos.shape[0]
    r2 = radius * radius
    contrib = jnp.zeros((qpos.shape[0], 3), jnp.float32)
    for p in range(num_p):
        wi = jnp.broadcast_to(p_win[p], qpos.shape)
        f = mat_mod.eval_bsdf(params, n, gn, w_out, wi)
        pdf_dir = mat_mod.pdf_bsdf(params, n, gn, w_out, wi)
        pdf_rev = mat_mod.pdf_bsdf(params, n, gn, wi, w_out)
        d2 = jnp.sum((ppos[p] - qpos) ** 2, axis=-1)
        ok = (active & pvalid[p] & (d2 <= r2) & (pdf_dir > 0.0)
              & (pdf_rev > 0.0) & jnp.any(f != 0.0, axis=-1))
        if ppm:
            w = jnp.ones_like(d2)
        else:
            w_light = p_dvcm[p] * eta_vc + p_dvm[p] * pdf_dir
            w_cam = q_dvcm * eta_vc + q_dvm * pdf_rev
            w = 1.0 / (w_light + 1.0 + w_cam)
        epan = jnp.maximum(1.0 - d2 / r2, 0.0)
        contrib = contrib + jnp.where(
            ok[:, None], p_tp[p] * f * (w * epan)[:, None], 0.0)
    return contrib


@pytest.mark.parametrize("kinds,ppm", [
    ((0,), False),                      # diffuse only (the cornell case)
    ((0, 3, 4, 5), False),              # all non-delta kinds
    ((0, 1, 2), False),                 # with delta kinds (must give 0)
    ((0,), True),                       # ppm weighting
])
def test_merge_kernel_matches_bruteforce(kinds, ppm):
    rs = np.random.RandomState(42)
    num_p, num_q = 700, 400
    radius = jnp.float32(0.07)
    eta_vc = jnp.float32(0.3)

    ppos = jnp.asarray(rs.rand(num_p, 3), jnp.float32)
    pvalid = jnp.asarray(rs.rand(num_p) > 0.1)
    p_win = jnp.asarray(_normalize(rs.randn(num_p, 3)), jnp.float32)
    p_tp = jnp.asarray(rs.rand(num_p, 3), jnp.float32)
    p_dvcm = jnp.asarray(rs.rand(num_p), jnp.float32)
    p_dvm = jnp.asarray(rs.rand(num_p), jnp.float32)

    (qpos, n, gn, w_out, params, q_dvcm, q_dvm, active) = _make_queries(
        rs, num_q, kinds)

    grid = pallas_merge.build_merge_grid(
        ppos, pvalid, radius, p_win, p_tp, p_dvcm, p_dvm)

    static_kinds = tuple(sorted(set(int(k) for k in kinds)))
    old = pallas_merge.INTERPRET
    pallas_merge.INTERPRET = True
    try:
        got = pallas_merge.merge_contrib(
            grid, qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
            eta_vc, kinds=static_kinds, ppm=ppm)
    finally:
        pallas_merge.INTERPRET = old

    want = _ref_merge(qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
                      ppos, pvalid, p_win, p_tp, p_dvcm, p_dvm,
                      radius, eta_vc, ppm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # Inactive queries contribute nothing.
    inact = ~np.asarray(active)
    assert np.all(np.asarray(got)[inact] == 0.0)
    # Sanity: the fixture actually exercises the join (some photons found).
    assert float(jnp.sum(jnp.abs(want))) > 0.0


def test_merge_kernel_boundary_dedup():
    """Queries pinned at the photon bbox edge: clamp-collapsed combos
    must not double count (regression for the -2 dedup)."""
    rs = np.random.RandomState(7)
    num_p = 64
    radius = jnp.float32(0.2)
    # All photons in a tiny cluster near the bbox corner -> queries at
    # the corner get m = -1 on every axis (clamped to 0).
    ppos = jnp.asarray(0.01 * rs.rand(num_p, 3), jnp.float32)
    pvalid = jnp.ones((num_p,), bool)
    p_win = jnp.asarray(_normalize(rs.randn(num_p, 3)), jnp.float32)
    p_tp = jnp.asarray(np.ones((num_p, 3)), jnp.float32)
    p_dvcm = jnp.zeros((num_p,), jnp.float32)
    p_dvm = jnp.zeros((num_p,), jnp.float32)

    num_q = 32
    (qpos, n, gn, w_out, params, q_dvcm, q_dvm, _) = _make_queries(
        rs, num_q, (0,))
    qpos = jnp.asarray(0.01 * rs.rand(num_q, 3), jnp.float32)
    active = jnp.ones((num_q,), bool)

    grid = pallas_merge.build_merge_grid(
        ppos, pvalid, radius, p_win, p_tp, p_dvcm, p_dvm)
    old = pallas_merge.INTERPRET
    pallas_merge.INTERPRET = True
    try:
        got = pallas_merge.merge_contrib(
            grid, qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
            jnp.float32(0.5), kinds=(0,), ppm=False)
    finally:
        pallas_merge.INTERPRET = old
    want = _ref_merge(qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
                      ppos, pvalid, p_win, p_tp, p_dvcm, p_dvm,
                      radius, jnp.float32(0.5), False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_vertex_merging_routes_agree():
    """The vcm._vertex_merging glue: the MergeGrid (Pallas) route and
    the HashGrid (windowed-XLA) route must agree on REAL scene data —
    a cornell light-pass vertex cache against real camera-hit queries.

    With a generous window (max_per_cell=64, low load factor) the window
    path examines every photon the exact walk does, so the only
    differences are accumulation order.  (A full-frame interpret-mode
    comparison is impractical: the Pallas interpreter inside the camera
    megastep's fori_loop takes >10 min to compile; the on-TPU full-frame
    A/B lives in scripts/bench_merge.py.)"""
    from imbatracer_tpu.render.camera import make_camera
    from imbatracer_tpu.render.hashgrid import build_hash_grid
    from imbatracer_tpu.render.integrators.vcm import (_vertex_merging,
                                                       debug_light_pass)
    from imbatracer_tpu.render.intersect import BIG
    from imbatracer_tpu.render.surface import make_interaction
    from imbatracer_tpu.render.traverse import closest_hit
    from imbatracer_tpu.render.integrators.pt import camera_rays
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    scene, meta = make_cornell_scene()
    size = 24
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, size, size,
                      60.0)
    radius = jnp.float32(0.06)
    cache = debug_light_pass(scene, cam, 0, radius, light_path_count=512,
                             max_len=4)
    valid = jnp.arange(cache.capacity) < cache.count
    assert int(cache.count) > 100

    org, d, state, pixel_id = camera_rays(cam, size, size, 1, jnp.uint32(0))
    hit = closest_hit(scene.bvh, org, d, 0.0, BIG)
    isect = make_interaction(scene, hit, org, d)
    active = hit.prim_id >= 0
    rs = np.random.RandomState(5)
    num_r = org.shape[0]
    throughput = jnp.ones((num_r, 3), jnp.float32)
    d_vcm = jnp.asarray(rs.rand(num_r), jnp.float32)
    d_vm = jnp.asarray(rs.rand(num_r), jnp.float32)
    radiance0 = jnp.zeros((num_r, 3), jnp.float32)
    eta_vc = jnp.float32(0.2)
    common = dict(light_path_count=512, num_knn=10, algo="vcm")

    hg = build_hash_grid(
        cache.pos, valid, radius, 8192,
        payload=jnp.concatenate(
            [cache.w_out, cache.throughput, cache.d_vcm[:, None],
             cache.d_vm[:, None]], axis=1))
    a = _vertex_merging(scene, None, None, hg, isect, throughput, d_vcm,
                        d_vm, active, radiance0, eta_vc, radius,
                        table_size=8192, max_per_cell=64, **common)

    mg = pallas_merge.build_merge_grid(
        cache.pos, valid, radius, cache.w_out, cache.throughput,
        cache.d_vcm, cache.d_vm)
    old = pallas_merge.INTERPRET
    pallas_merge.INTERPRET = True
    try:
        b = _vertex_merging(scene, None, None, mg, isect, throughput,
                            d_vcm, d_vm, active, radiance0, eta_vc, radius,
                            table_size=8192, max_per_cell=64, **common)
    finally:
        pallas_merge.INTERPRET = old
    a, b = np.asarray(a), np.asarray(b)
    assert float(np.abs(a).sum()) > 0.0  # fixture really merges photons
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_merge_kernel_tiny_radius():
    """Progressive-radius regression: a radius far smaller than the
    scene (true grid >> 256 cells/axis) must still be exact — the cell
    size grows to fit the 256³ key space instead of aliasing photons
    into boundary mega-cells."""
    rs = np.random.RandomState(12)
    num_p, num_q = 600, 300
    radius = jnp.float32(0.0008)

    ppos = jnp.asarray(rs.rand(num_p, 3), jnp.float32)
    # Guarantee some in-radius pairs: co-locate queries with photons.
    qbase = np.asarray(ppos)[rs.randint(0, num_p, num_q)]
    pvalid = jnp.ones((num_p,), bool)
    p_win = jnp.asarray(_normalize(rs.randn(num_p, 3)), jnp.float32)
    p_tp = jnp.asarray(rs.rand(num_p, 3), jnp.float32)
    p_dvcm = jnp.asarray(rs.rand(num_p), jnp.float32)
    p_dvm = jnp.asarray(rs.rand(num_p), jnp.float32)

    (qpos, n, gn, w_out, params, q_dvcm, q_dvm, active) = _make_queries(
        rs, num_q, (0,))
    qpos = jnp.asarray(
        qbase + 0.0005 * rs.randn(num_q, 3).astype(np.float32))

    grid = pallas_merge.build_merge_grid(
        ppos, pvalid, radius, p_win, p_tp, p_dvcm, p_dvm)
    old = pallas_merge.INTERPRET
    pallas_merge.INTERPRET = True
    try:
        got = pallas_merge.merge_contrib(
            grid, qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
            jnp.float32(0.2), kinds=(0,), ppm=False)
    finally:
        pallas_merge.INTERPRET = old
    want = _ref_merge(qpos, n, gn, w_out, params, q_dvcm, q_dvm, active,
                      ppos, pvalid, p_win, p_tp, p_dvcm, p_dvm,
                      radius, jnp.float32(0.2), False)
    assert float(np.abs(np.asarray(want)).sum()) > 0.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
