"""MIS technique debugger: each contribution site can be isolated with
identical RNG streams, so per-technique films sum exactly to the full
render — the machine-checkable analogue of the reference's MISDebugger
weight-sum inspection (reference: render/debug/mis_debug.h,
test/convert_mis_images.sh)."""

import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.frontend.renderer import RenderSettings
from imbatracer_tpu.frontend.engine import camera_for_scene, estimate_pixel_size
from imbatracer_tpu.render.integrators.vcm import TECHNIQUES, render_vcm_frame
from imbatracer_tpu.scene.procedural import make_cornell_scene

SIZE = 24


@pytest.mark.parametrize("algo", ["vcm", "bpt"])
def test_technique_films_sum_to_full(algo):
    scene, meta = make_cornell_scene()
    settings = RenderSettings(width=SIZE, height=SIZE)
    cam = camera_for_scene(meta, settings)
    base_radius = jnp.float32(
        estimate_pixel_size(scene, cam, meta) * settings.radius_factor
    )

    kwargs = dict(
        algo=algo, width=SIZE, height=SIZE, max_len=4, light_path_count=128,
        num_connections=1, num_knn=4,
    )
    full = np.asarray(render_vcm_frame(scene, cam, jnp.uint32(0), base_radius, **kwargs))

    parts = {}
    total = np.zeros_like(full)
    for tech in TECHNIQUES:
        img = np.asarray(render_vcm_frame(
            scene, cam, jnp.uint32(0), base_radius, techniques=(tech,), **kwargs
        ))
        parts[tech] = img
        total += img

    np.testing.assert_allclose(total, full, rtol=1e-4, atol=1e-5)
    # The expected techniques contribute for each algorithm.
    assert parts["light_hit"].sum() > 0
    assert parts["next_event"].sum() > 0
    assert parts["cam_connect"].sum() > 0
    assert parts["connect"].sum() > 0
    if algo == "vcm":
        assert parts["merge"].sum() > 0
    else:
        assert parts["merge"].sum() == 0
