"""Regenerated-wavefront PT (render_pt_frame_regen) vs the banded
renderer: identical estimator, different lane packing."""

import jax.numpy as jnp
import numpy as np

from imbatracer_tpu.render import integrators
from imbatracer_tpu.render.camera import make_camera
from imbatracer_tpu.render.integrators import pt as pt_mod
from imbatracer_tpu.scene.procedural import make_cornell_scene


def _frames(size, spp, lanes):
    scene, meta = make_cornell_scene()
    cam = make_camera(meta.cam_pos, meta.cam_dir, meta.cam_up, size, size,
                      60.0)
    a = np.asarray(pt_mod.render_pt_frame(
        scene, cam, jnp.uint32(0), size, size, spp=spp, max_len=5))
    old = pt_mod.BAND_RAYS
    pt_mod.BAND_RAYS = lanes
    try:
        b, n = pt_mod.render_pt_frame_regen(
            scene, cam, jnp.uint32(0), size, size, spp=spp, max_len=5,
            with_stats=True)
    finally:
        pt_mod.BAND_RAYS = old
    return a, np.asarray(b), int(n), scene, cam, size, spp


def test_regen_matches_banded_small_lanes():
    """Lane pool far smaller than the path count: heavy recycling, many
    megastep launches; every path must land exactly once."""
    a, b, n, scene, cam, size, spp = _frames(size=48, spp=1, lanes=512)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    assert n > 0


def test_regen_matches_banded_spp():
    """spp > 1 exercises the sample-major queue ordering."""
    a, b, n, scene, cam, size, spp = _frames(size=24, spp=3, lanes=640)
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

    # Ray stats match the banded renderer exactly (same per-path sets).
    _, n_banded = pt_mod.render_pt_frame(
        scene, cam, jnp.uint32(0), size, size, spp=spp, max_len=5,
        with_stats=True)
    assert n == int(n_banded)
