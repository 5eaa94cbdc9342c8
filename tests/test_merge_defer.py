"""Deferred vertex merging (vcm._flush_merge_qlog + the qlog camera-pass
route): one batched merge_contrib dispatch per band/phase must reproduce
the per-bounce dispatches exactly (merging is read-only w.r.t. the path
carry, so deferral is estimator-exact up to float association).

Reference behaviour being preserved: vcm.cpp:571-611 evaluates merging
at every non-specular camera vertex; only the dispatch schedule moves.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.ops import pallas_merge
from imbatracer_tpu.render import materials as mat_mod
from imbatracer_tpu.render.integrators import vcm as vcm_mod
from imbatracer_tpu.core.sampling import PI


def _normalize(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _queries(rs, n, kinds=(0,)):
    pos = rs.rand(n, 3).astype(np.float32)
    nrm = _normalize(rs.randn(n, 3)).astype(np.float32)
    gn = _normalize(nrm + 0.1 * rs.randn(n, 3)).astype(np.float32)
    w_out = _normalize(rs.randn(n, 3)).astype(np.float32)
    kind = rs.choice(kinds, n).astype(np.int32)
    kd = rs.rand(n, 3).astype(np.float32)
    ks = rs.rand(n, 3).astype(np.float32)
    ns = (1.0 + rs.rand(n) * 20.0).astype(np.float32)
    d_vcm = rs.rand(n).astype(np.float32)
    d_vm = rs.rand(n).astype(np.float32)
    tp = rs.rand(n, 3).astype(np.float32)
    act = rs.rand(n) > 0.25
    return dict(pos=pos, nrm=nrm, gn=gn, w_out=w_out, kind=kind, kd=kd,
                ks=ks, ns=ns, d_vcm=d_vcm, d_vm=d_vm, tp=tp, act=act)


def test_flush_matches_per_bounce_dispatches():
    rs = np.random.RandomState(7)
    num_p, lanes, bounces = 500, 160, 3
    radius = jnp.float32(0.08)
    eta_vc = jnp.float32(0.3)
    lpc = 512

    ppos = jnp.asarray(rs.rand(num_p, 3), jnp.float32)
    pvalid = jnp.asarray(rs.rand(num_p) > 0.1)
    p_win = jnp.asarray(_normalize(rs.randn(num_p, 3)), jnp.float32)
    p_tp = jnp.asarray(rs.rand(num_p, 3), jnp.float32)
    p_dvcm = jnp.asarray(rs.rand(num_p), jnp.float32)
    p_dvm = jnp.asarray(rs.rand(num_p), jnp.float32)
    grid = pallas_merge.build_merge_grid(
        ppos, pvalid, radius, p_win, p_tp, p_dvcm, p_dvm)

    per_bounce = [_queries(rs, lanes) for _ in range(bounces)]
    # Pack the qlog exactly as the camera body does (component-major).
    qlog = np.zeros((vcm_mod._QLOG_COLS, bounces, lanes), np.float32)
    for i, q in enumerate(per_bounce):
        rec = np.concatenate([
            q["pos"].T, q["nrm"].T, q["gn"].T, q["w_out"].T,
            q["kind"].astype(np.float32)[None], q["kd"].T, q["ks"].T,
            q["ns"][None], q["d_vcm"][None], q["d_vm"][None], q["tp"].T,
            q["act"].astype(np.float32)[None],
        ], axis=0)
        qlog[:, i, :] = rec

    old = pallas_merge.INTERPRET
    pallas_merge.INTERPRET = True
    try:
        got = vcm_mod._flush_merge_qlog(
            jnp.asarray(qlog), grid, radius, eta_vc, lpc,
            mat_kinds=(0,), ppm=False)
        want = np.zeros((lanes, 3), np.float32)
        norm = 2.0 / (float(PI) * float(radius) ** 2 * lpc)
        for q in per_bounce:
            params = dict(kind=jnp.asarray(q["kind"]),
                          kd=jnp.asarray(q["kd"]), ks=jnp.asarray(q["ks"]),
                          ns=jnp.asarray(q["ns"]))
            contrib = pallas_merge.merge_contrib(
                grid, jnp.asarray(q["pos"]), jnp.asarray(q["nrm"]),
                jnp.asarray(q["gn"]), jnp.asarray(q["w_out"]), params,
                jnp.asarray(q["d_vcm"]), jnp.asarray(q["d_vm"]),
                jnp.asarray(q["act"]), eta_vc, kinds=(0,), ppm=False)
            want += np.where(q["act"][:, None],
                             q["tp"] * np.asarray(contrib) * norm, 0.0)
    finally:
        pallas_merge.INTERPRET = old

    assert float(np.abs(want).sum()) > 0.0
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-6)


def _render(scene, cam, monkeypatch, *, merge_kernel, **kw):
    if merge_kernel:
        monkeypatch.setattr(pallas_merge, "INTERPRET", True)
        monkeypatch.setenv("IMBA_MERGE_DEFER", "1")  # opt-in since chain49
    return np.asarray(vcm_mod.render_vcm_frame(
        scene, cam, jnp.uint32(0), jnp.float32(0.05),
        merge_kernel=merge_kernel, **kw))


@pytest.fixture(scope="module")
def cornell():
    from imbatracer_tpu.render.camera import make_camera
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    scene, meta = make_cornell_scene()
    size = 24
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, size, size,
                      60.0)
    return scene, cam, size


def test_defer_frame_matches_hashgrid_route(cornell, monkeypatch):
    """Full-frame: the deferred kernel route vs the windowed-XLA HashGrid
    route with a generous window (every photon examined) — only
    accumulation order differs.  (A per-bounce kernel A/B is impractical
    on CPU: interpret-mode Pallas inside the megastep fori takes >10 min
    to compile — the deferred route moves the kernel OUT of the loop,
    which is what makes this frame-level test possible at all.)"""
    scene, cam, size = cornell
    kw = dict(algo="vcm", width=size, height=size, spp=1, max_len=3,
              light_path_count=256, max_per_cell=64)
    monkeypatch.setenv("IMBA_VCM_COMPACT", "0")
    a = _render(scene, cam, monkeypatch, merge_kernel=False, **kw)
    b = _render(scene, cam, monkeypatch, merge_kernel=True, **kw)
    assert np.isfinite(b).all()
    assert float(np.abs(b).sum()) > 0.0
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_defer_compact_matches_banded(cornell, monkeypatch):
    """The qlog flows through both compaction phases: phase-1 flush
    before _compact_carry's lane sort + per-band phase-2 flushes must
    reproduce the single banded frame."""
    scene, cam, size = cornell
    kw = dict(algo="vcm", width=size, height=size, spp=1, max_len=4,
              light_path_count=256, max_per_cell=64)
    monkeypatch.setenv("IMBA_VCM_COMPACT", "0")
    a = _render(scene, cam, monkeypatch, merge_kernel=True, **kw)
    monkeypatch.setenv("IMBA_VCM_COMPACT", "1")
    monkeypatch.setenv("IMBA_VCM_COMPACT_DEPTH", "2")
    monkeypatch.setattr(vcm_mod, "BAND_RAYS", 192)
    b = _render(scene, cam, monkeypatch, merge_kernel=True, **kw)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
