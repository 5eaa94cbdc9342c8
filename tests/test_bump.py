"""Bump mapping: finite-difference expectation + render-level effect.

The round-1/2 gap: bump perturbation was wired (surface._bump_normal,
reference materials.h:33-55) but no test ever rendered a bumped surface.
The fixture floor carries a LINEAR height ramp along u, for which the
central difference ds/du == 1 exactly (bilinear sampling of linear data),
so the perturbed normal is known in closed form."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render.intersect import BIG
from imbatracer_tpu.render.surface import make_interaction
from imbatracer_tpu.render.traverse import closest_hit
from imbatracer_tpu.scene.procedural import make_bumped_scene

VSCALE = 0.02  # surface._bump_normal, the reference's constant


def _floor_hits(scene, num=64):
    rs = np.random.RandomState(3)
    # Downward rays over the floor interior (u stays clear of the wrap
    # seam: x in [-0.5, 0.5] -> u in [0.25, 0.75]).
    xz = (rs.rand(num, 2) - 0.5).astype(np.float32)
    org = jnp.asarray(
        np.stack([xz[:, 0], np.ones(num, np.float32), xz[:, 1]], axis=1))
    d = jnp.asarray(np.tile([0.0, -1.0, 0.0], (num, 1)).astype(np.float32))
    hit = closest_hit(scene.bvh, org, d, 0.0, BIG)
    assert np.all(np.asarray(hit.prim_id) >= 0)
    return hit, org, d


def test_bumped_normal_matches_finite_difference():
    scene, meta = make_bumped_scene()
    hit, org, d = _floor_hits(scene)

    isect_flat = make_interaction(scene, hit, org, d, has_bump=False)
    np.testing.assert_allclose(
        np.asarray(isect_flat.normal),
        np.tile([0.0, 1.0, 0.0], (org.shape[0], 1)), atol=1e-6)

    isect = make_interaction(scene, hit, org, d, has_bump=True)
    # Closed form: n = (0,1,0); ONB t = (1,0,0), b = (0,0,-1) (Duff);
    # diff_u = VSCALE * ds/du = VSCALE, diff_v = 0 (ramp constant in v);
    # n' = normalize(cross(normalize(t + VSCALE*n), b)).
    t2 = np.array([1.0, VSCALE, 0.0])
    t2 /= np.linalg.norm(t2)
    expect = np.cross(t2, [0.0, 0.0, -1.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(
        np.asarray(isect.normal),
        np.tile(expect, (org.shape[0], 1)), atol=2e-4)


def test_bump_changes_render():
    """The bump route must actually reach the shading path: identical
    frames except has_bump must differ on the floor."""
    from imbatracer_tpu.render.camera import make_camera
    from imbatracer_tpu.render.integrators.pt import render_pt_frame

    scene, meta = make_bumped_scene()
    size = 24
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up,
                      size, size, 60.0)
    a = np.asarray(render_pt_frame(scene, cam, jnp.uint32(0), size, size,
                                   max_len=3, has_bump=False))
    b = np.asarray(render_pt_frame(scene, cam, jnp.uint32(0), size, size,
                                   max_len=3, has_bump=True))
    # Same RNG: all differences come from the perturbed shading normals.
    assert float(np.mean(np.abs(a - b))) > 1e-4
    assert np.isfinite(b).all()
