"""Shade-record column pruning must be exact.

The build drops shade_rec columns no consumer can read
(scene/types.py::shade_columns): inst/local ids and the pad
unconditionally, uv/texture ids without textures, ks/tf/ns/ior when no
present material kind reads them (the same static facts that drive kind
specialization).  The contract: rendering with the pruned record equals
rendering with the full 48-column layout (IMBA_PRUNE=0) — the fetched
VALUES are identical bits, so on the deterministic CPU backend frames
must match bitwise.  Reference role: this narrows the per-hit
`calculate_intersection` load (reference: render/integrators/
integrator.h:71-123) to the fields the scene's material set can touch.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from imbatracer_tpu.scene.types import shade_columns

CORNELL_SPECULAR = "/root/reference/test/scenes/cornell/cornell_specular.scene"


def _build(prune, maker):
    old = os.environ.get("IMBA_PRUNE")
    os.environ["IMBA_PRUNE"] = prune
    try:
        return maker()
    finally:
        if old is None:
            os.environ.pop("IMBA_PRUNE")
        else:
            os.environ["IMBA_PRUNE"] = old


def _pt_frame(scene, meta, size=48, max_len=5):
    from imbatracer_tpu.frontend.renderer import RenderSettings, camera_for_scene
    from imbatracer_tpu.render.integrators.pt import render_pt_frame

    cam = camera_for_scene(meta, RenderSettings(width=size, height=size))
    return np.asarray(render_pt_frame(
        scene, cam, jnp.uint32(1), size, size, spp=1, max_len=max_len,
        has_masks=meta.has_masks))


def test_column_sets():
    # Diffuse-only, no textures: geometry + ids + kind/kd + emit/area.
    cols = shade_columns((0,), False, False, False)
    assert cols == tuple(list(range(12)) + [18, 19, 22, 23, 24, 25,
                                            34, 35, 36, 37])
    # Unknown kinds (spec off) keep every kind column but still drop the
    # dead inst/local ids and the pad.
    cols = shade_columns((), True, True, True)
    assert 20 not in cols and 21 not in cols
    assert all(c not in cols for c in range(41, 48))
    assert all(c in cols for c in (26, 29, 32, 33, 38, 39, 40))
    # Glass pulls tf + ior; mirror alone does not.
    assert 29 in shade_columns((2,), False, False, False)
    assert 33 in shade_columns((2,), False, False, False)
    assert 29 not in shade_columns((1,), False, False, False)
    # Every 2/3-wide canonical group must stay contiguous when present
    # (make_interaction reads them as row slices).
    for kinds in [(), (0,), (2,), (0, 2, 3), tuple(range(6))]:
        for tex in (False, True):
            cols = shade_columns(kinds, tex, tex, tex)
            pos = {c: i for i, c in enumerate(cols)}
            for base, width in [(0, 3), (3, 3), (6, 3), (9, 3), (12, 2),
                                (14, 2), (16, 2), (23, 3), (26, 3),
                                (29, 3), (34, 3)]:
                if base in pos:
                    for j in range(width):
                        assert pos.get(base + j) == pos[base] + j


@pytest.mark.parametrize("case", ["cornell", "leaf", "specular"])
def test_pruned_render_bitwise(case):
    from imbatracer_tpu.scene.procedural import make_cornell_scene, make_leaf_scene

    if case == "cornell":
        maker = make_cornell_scene
    elif case == "leaf":
        maker = lambda: make_leaf_scene(num_leaves=200)
    else:
        if not os.path.exists(CORNELL_SPECULAR):
            pytest.skip("reference scene missing")
        from imbatracer_tpu.scene.build import build_scene

        maker = lambda: build_scene(CORNELL_SPECULAR, quiet=True)

    sc1, m1 = _build("1", maker)
    sc0, m0 = _build("0", maker)
    assert len(sc1.attrs.shade_cols) < len(sc0.attrs.shade_cols) == 48
    f1 = _pt_frame(sc1, m1)
    f0 = _pt_frame(sc0, m0)
    assert np.array_equal(f1, f0)


def test_pruned_vcm_bitwise():
    # The VCM light-vertex cache stores isect.uv; on texture-free scenes
    # the pruned build records zeros there, which must not change the
    # estimate (uv is only consumed for texture lookups).
    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import RenderSettings
    from imbatracer_tpu.scene.procedural import make_cornell_scene

    def frame(prune):
        scene, meta = _build(prune, make_cornell_scene)
        settings = RenderSettings(width=32, height=32, algorithm="vcm",
                                  max_path_len=4, light_path_count=256)
        fn, _ = make_frame_fn(scene, meta, settings)
        return np.asarray(fn(jnp.uint32(2)))

    assert np.array_equal(frame("1"), frame("0"))
