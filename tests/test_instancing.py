"""Two-level instanced traversal vs the flattened single-level reference.

The reference exercises its TopLevelAdapter/InstanceNode machinery with
cornell_instances.scene (core/adapter.h:25-38, cpu_adapter.cpp:221-378);
here the streaming kernel's instanced variant (per-super-chunk transforms,
shared mesh tiles — accel/instancing.py) must produce identical hits to a
world-space-flattened BVH."""

import jax
import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes
from imbatracer_tpu.accel.device import DeviceBvh
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.accel.instancing import build_two_level
from imbatracer_tpu.core import math3d
from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.traverse import any_hit, closest_hit


def _box_mesh(n_seg=3):
    """A subdivided unit box around the origin (~108 tris)."""
    from imbatracer_tpu.scene.procedural import _add_box

    tris = []
    for i in range(n_seg):
        _add_box(tris, center=(0, 0.18 * i, 0), size=(1.0 - 0.2 * i, 0.15, 1.0 - 0.2 * i),
                 angle_deg=15.0 * i, mat=0)
    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    return v0, v1, v2


def _instances():
    specs = [
        dict(pos=(0.0, 0.0, 0.0), scale=(1.0, 1.0, 1.0), rot=(0, 0, 0)),
        dict(pos=(2.5, 0.3, -1.0), scale=(0.7, 0.7, 0.7), rot=(0, 40, 0)),
        dict(pos=(-2.0, -0.2, 1.5), scale=(1.6, 1.2, 1.6), rot=(10, 0, 25)),
        dict(pos=(0.5, 1.5, 2.0), scale=(0.5, 0.5, 0.5), rot=(0, 160, 80)),
    ]
    return [math3d.instance_matrix(s["pos"], s["scale"], s["rot"]) for s in specs]


def _interp(fn):
    import jax.experimental.pallas as pl
    from imbatracer_tpu.ops import pallas_stream as ps

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


def test_two_level_matches_flattened():
    v0, v1, v2 = _box_mesh()
    mats = _instances()
    f = v0.shape[0]

    # Flattened single-level reference (world space).
    wv0, wv1, wv2 = [], [], []
    for m in mats:
        wv0.append(math3d.transform_points(m, v0).astype(np.float32))
        wv1.append(math3d.transform_points(m, v1).astype(np.float32))
        wv2.append(math3d.transform_points(m, v2).astype(np.float32))
    wv0, wv1, wv2 = map(np.concatenate, (wv0, wv1, wv2))
    lo, hi = triangle_bboxes(wv0, wv1, wv2)
    flat = DeviceBvh.from_threaded(
        thread_bvh(build_bvh(lo, hi), wv0, wv1, wv2), mode="xla"
    )

    # Two-level: one shared mesh, 4 instances.
    tl = build_two_level(
        [(v0, v1, v2)],
        [dict(mesh_idx=0, matrix=m, face_base=i * f)
         for i, m in enumerate(mats)],
    )
    assert tl.stats["unique_tris"] == f
    bvh2 = DeviceBvh.from_two_level(tl)
    assert bvh2.mode == "stream2"

    rs = np.random.RandomState(11)
    n = 1024
    org = jnp.asarray(rs.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = jnp.asarray(rs.randn(n, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def run():
        h2 = closest_hit(bvh2, org, d, 0.0, BIG)
        hx = closest_hit(flat, org, d, 0.0, BIG)
        # t agreement everywhere (ids may differ on exact-overlap seams).
        np.testing.assert_allclose(
            np.asarray(h2.t), np.asarray(hx.t), rtol=2e-4, atol=1e-5
        )
        same = np.asarray(h2.prim_id == hx.prim_id)
        assert same.mean() > 0.995, f"id agreement {same.mean():.4f}"

        occ2 = any_hit(bvh2, org, d, 0.0, jnp.full((n,), 2.5))
        occx = any_hit(flat, org, d, 0.0, jnp.full((n,), 2.5))
        bad = int(jnp.sum(occ2 != occx))
        assert bad <= 2, f"{bad} occlusion mismatches"

    _interp(run)
