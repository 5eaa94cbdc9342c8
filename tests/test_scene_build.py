"""Scene-building tests against the bundled reference assets
(SURVEY.md §7 step 1: "Unit tests against the bundled cornell ... assets")."""

import numpy as np
import pytest

from imbatracer_tpu.io.obj import load_mtl, load_obj
from imbatracer_tpu.io.scene_file import parse_scene_file
from imbatracer_tpu.render import materials as mat_mod
from imbatracer_tpu.scene.build import build_scene

CORNELL = "/root/reference/test/scenes/cornell"


def test_obj_parse_counts(cornell_scene_path):
    f = load_obj(f"{CORNELL}/CornellBox-Original.obj")
    # 36 triangles: 5 walls + 2 boxes + light quad, fan-triangulated.
    assert len(f.triangles) == 36
    mtl = load_mtl(f"{CORNELL}/CornellBox-Original.mtl")
    assert {"leftWall", "rightWall", "light"} <= set(mtl)
    assert max(mtl["light"].ke) > 0.0


def test_scene_file_parse(cornell_scene_path):
    desc = parse_scene_file(cornell_scene_path)
    assert desc.mesh_paths == ["CornellBox-Original.obj"]
    assert desc.cam_pos == (0.0, 0.9, 2.5)
    # No instances listed -> identity instance per mesh.
    assert len(desc.instances) == 1


def test_build_cornell(cornell_scene_path):
    scene, meta = build_scene(cornell_scene_path)
    assert meta.num_tris == 36
    # The light quad = 2 emissive triangles = 2 area lights.
    assert meta.num_lights == 2
    kinds = np.asarray(scene.materials.kind)
    assert (kinds == mat_mod.MAT_DIFFUSE).all()
    lids = np.asarray(scene.attrs.light_id)
    assert (lids >= 0).sum() == 2
    # Shading data is finite and normalised.
    for n in (scene.attrs.n0, scene.attrs.gn):
        n = np.asarray(n)
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)


def test_build_specular_materials():
    scene, meta = build_scene(f"{CORNELL}/cornell_specular.scene")
    kinds = np.asarray(scene.materials.kind)
    # The specular cornell has mirror (illum 5) and glass (illum 7) parts.
    assert (kinds == mat_mod.MAT_MIRROR).any()
    assert (kinds == mat_mod.MAT_GLASS).any()
    glass_rows = kinds == mat_mod.MAT_GLASS
    assert np.asarray(scene.materials.ior)[glass_rows].min() > 1.0


def test_build_instances():
    scene, meta = build_scene(f"{CORNELL}/cornell_instances.scene")
    inst = np.asarray(scene.attrs.inst_id)
    n_instances = inst.max() + 1
    assert n_instances >= 20  # the scene lists 20+ instances
    # Each instance's triangles came from its mesh; local ids restart at 0.
    local = np.asarray(scene.attrs.local_id)
    for i in range(n_instances):
        sel = inst == i
        assert local[sel].min() == 0
    # Instanced emissive faces each became a light (per instance!).
    assert meta.num_lights >= n_instances  # every instance has a light quad


def test_bvh_cache_roundtrip(tmp_path, cornell_scene_path):
    from imbatracer_tpu.accel.builder import build_bvh, triangle_bboxes
    from imbatracer_tpu.accel.flatten import thread_bvh
    from imbatracer_tpu.io import bvh_cache

    rs = np.random.RandomState(0)
    v0 = rs.rand(64, 3).astype(np.float32)
    v1 = v0 + rs.rand(64, 3).astype(np.float32) * 0.1
    v2 = v0 + rs.rand(64, 3).astype(np.float32) * 0.1
    lo, hi = triangle_bboxes(v0, v1, v2)
    tb = thread_bvh(build_bvh(lo, hi), v0, v1, v2)

    path = str(tmp_path / "test.npz")
    bvh_cache.store_accel(path, tb, "key123")
    loaded = bvh_cache.load_accel(path, "key123")
    assert loaded is not None
    np.testing.assert_array_equal(loaded.nodes64, tb.nodes64)
    np.testing.assert_array_equal(loaded.tri_id, tb.tri_id)
    # Stale key rejected.
    assert bvh_cache.load_accel(path, "other") is None


def test_still_life_proxy_scene():
    """Config-2/4 proxy generator (make_still_life_like, BASELINE configs
    2/4/5): full material set + env light + masked cards must assemble
    and render a finite, lit frame end to end."""
    import jax.numpy as jnp

    from imbatracer_tpu.frontend.engine import make_frame_fn
    from imbatracer_tpu.frontend.renderer import RenderSettings
    from imbatracer_tpu.render import materials as mat_mod
    from imbatracer_tpu.scene.procedural import make_still_life_like

    scene, meta = make_still_life_like(num_objects=160, num_cards=24,
                                       seed=3)
    assert meta.has_env and meta.has_masks
    kinds = set(np.asarray(scene.materials.kind).tolist())
    assert {mat_mod.MAT_DIFFUSE, mat_mod.MAT_MIRROR, mat_mod.MAT_GLASS,
            mat_mod.MAT_GLOSSY, mat_mod.MAT_PHONG,
            mat_mod.MAT_OREN_NAYAR} <= kinds
    # At full scale the scene crosses the >=100k-tri bar (12 tris/box).
    assert 160 * 12 < meta.num_tris < 160 * 12 + 24 * 2 + 8

    res = 24
    settings = RenderSettings(width=res, height=res, spp=4, algorithm="pt",
                              max_path_len=4)
    frame_fn, _ = make_frame_fn(scene, meta, settings)
    film = np.asarray(frame_fn(jnp.uint32(0)))
    assert np.isfinite(film).all()
    assert film.mean() > 0.01  # lit by env + area light
