"""Procedural test scenes (no asset files needed).

Used by unit tests, `__graft_entry__` and benchmarks; geometry is an
original construction in the spirit of the classic Cornell box (the
reference ships it only as OBJ assets).
"""

from __future__ import annotations

import numpy as np

from ..render import lights as light_mod
from ..render import materials as mat_mod
from .build import assemble_device_scene
from .types import SceneMeta


def _quad(p00, p10, p11, p01):
    """Two CCW triangles for a quad given corners in order."""
    return [(p00, p10, p11), (p00, p11, p01)]


def make_cornell_scene(with_boxes: bool = True, mirror_box: bool = False,
                       glass_sphere: bool = False, light: str = "tri"):
    """An enclosed box with a light; returns (DeviceScene, SceneMeta).

    Walls: white floor/ceiling/back, red left, green right.  Optional inner
    blocks.  `light` selects the emitter kind: "tri" (default, one emissive
    quad near the ceiling, matching the reference's cornell assets) or
    "point" / "spot" / "dir" (the reference's `.scene` point_light /
    spot_light / dir_light entries, build_scene.cpp:366-420) — used to
    exercise every light kind's sampling code end-to-end.
    """
    tris = []      # (v0, v1, v2, mat_id)
    W, H, D = 2.0, 2.0, 2.0  # box spans x:[-1,1], y:[0,2], z:[-1,1]

    white, red, green, lightm = 0, 1, 2, 3
    mirror, glass = 4, 5

    def add(quads, mat):
        for t in quads:
            tris.append((*t, mat))

    add(_quad((-1, 0, 1), (1, 0, 1), (1, 0, -1), (-1, 0, -1)), white)      # floor
    add(_quad((-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1)), white)      # ceiling
    add(_quad((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)), white)    # back
    add(_quad((-1, 0, 1), (-1, 0, -1), (-1, 2, -1), (-1, 2, 1)), red)      # left
    add(_quad((1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)), green)        # right
    if light == "tri":
        # Light quad slightly below the ceiling, facing down (normal -y).
        add(_quad((-0.3, 1.99, -0.3), (0.3, 1.99, -0.3), (0.3, 1.99, 0.3),
                  (-0.3, 1.99, 0.3)), lightm)

    if with_boxes:
        bm = mirror if mirror_box else white
        _add_box(tris, center=(-0.4, 0.45, -0.3), size=(0.55, 0.9, 0.55),
                 angle_deg=20.0, mat=bm)
        _add_box(tris, center=(0.45, 0.25, 0.35), size=(0.5, 0.5, 0.5),
                 angle_deg=-17.0, mat=glass if glass_sphere else white)

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat_id = np.asarray([t[3] for t in tris], np.int32)
    n = np.cross(v1 - v0, v2 - v0)
    area2 = np.linalg.norm(n, axis=-1, keepdims=True)
    gn = (n / np.maximum(area2, 1e-20)).astype(np.float32)

    F = len(tris)
    zeros2 = np.zeros((F, 2), np.float32)
    attrs = dict(
        n0=gn, n1=gn, n2=gn, uv0=zeros2, uv1=zeros2, uv2=zeros2,
        mat_id=mat_id, light_id=np.full(F, -1, np.int32),
        inst_id=np.zeros(F, np.int32), local_id=np.arange(F, dtype=np.int32),
    )

    emit_intensity = (18.0, 14.0, 9.0)
    base = dict(ks=(0, 0, 0), tf=(0, 0, 0), ns=1.0, ior=1.0,
                emit=(0, 0, 0), kd_tex=-1, bump_tex=-1, mask_tex=-1)
    mat_rows = [
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.76, 0.75, 0.5)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.63, 0.06, 0.04)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.15, 0.48, 0.09)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.78, 0.78, 0.78), emit=emit_intensity),
        dict(base, kind=mat_mod.MAT_MIRROR, kd=(0, 0, 0), ks=(0.9, 0.9, 0.9), ns=1000.0),
        dict(base, kind=mat_mod.MAT_GLASS, kd=(0, 0, 0), ks=(1, 1, 1),
             tf=(1, 1, 1), ior=1.5),
    ]

    light_rows = []
    for ti in np.nonzero(mat_id == lightm)[0]:
        nn = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
        area = 0.5 * np.linalg.norm(nn)
        attrs["light_id"][ti] = len(light_rows)
        light_rows.append(
            dict(kind=light_mod.LIGHT_TRI, p0=v0[ti], p1=v1[ti], p2=v2[ti],
                 normal=nn / (2 * area), intensity=emit_intensity, area=area)
        )
    if light == "point":
        # Total flux comparable to the area light (reference PointLight
        # semantics: radiance = intensity / (4 pi d^2), light.h:266-283).
        light_rows.append(dict(kind=light_mod.LIGHT_POINT, p0=(0.0, 1.7, 0.0),
                               intensity=(6.0, 5.0, 3.5)))
    elif light == "spot":
        light_rows.append(dict(kind=light_mod.LIGHT_SPOT, p0=(0.0, 1.9, 0.0),
                               normal=(0.0, -1.0, 0.0),
                               intensity=(6.0, 5.0, 3.5),
                               cos_angle=np.cos(np.deg2rad(40.0))))
    elif light == "dir":
        # Shines in through the open front face (+z) of the box.
        dn = np.asarray((0.2, -0.6, -1.0), np.float32)
        light_rows.append(dict(kind=light_mod.LIGHT_DIR,
                               normal=dn / np.linalg.norm(dn),
                               intensity=(1.5, 1.3, 1.0)))

    scene = assemble_device_scene(v0, v1, v2, attrs, mat_rows, light_rows, [], None)
    meta = SceneMeta(
        name="procedural_cornell",
        num_tris=F,
        num_materials=len(mat_rows),
        num_lights=len(light_rows),
        num_textures=0,
        has_env=False,
        has_masks=False,
        cam_pos=(0.0, 1.0, 3.6),
        cam_dir=(0.0, 0.0, -1.0),
        cam_up=(0.0, 1.0, 0.0),
        bvh_stats=scene.bvh_stats,
    )
    return scene, meta


def make_masked_scene():
    """Cornell box plus an alpha-masked occluder quad under the light.

    The occluder spans x:[-0.8,0.8] at y=1.2; its mask texture is black
    (transparent) for u < 0.5 and white (opaque) for u >= 0.5, with u
    mapped along +x.  Exercises the reference's masked kernel semantics
    (core/mask.h binarisation + masked traversal variants,
    render/scheduling/ray_queue.h:254-341): shadows must appear only
    under the opaque half."""
    tris = []
    white = 0

    def add(quads, mat):
        for t in quads:
            tris.append((*t, mat))

    add(_quad((-1, 0, 1), (1, 0, 1), (1, 0, -1), (-1, 0, -1)), white)      # floor
    add(_quad((-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1)), white)      # ceiling
    add(_quad((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)), white)    # back
    add(_quad((-1, 0, 1), (-1, 0, -1), (-1, 2, -1), (-1, 2, 1)), 1)        # left
    add(_quad((1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)), 2)            # right
    add(_quad((-0.3, 1.99, -0.3), (0.3, 1.99, -0.3), (0.3, 1.99, 0.3),
              (-0.3, 1.99, 0.3)), 3)                                       # light
    masked = 4
    occ = _quad((-0.8, 1.2, -0.6), (0.8, 1.2, -0.6), (0.8, 1.2, 0.6),
                (-0.8, 1.2, 0.6))
    add(occ, masked)

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat_id = np.asarray([t[3] for t in tris], np.int32)
    n = np.cross(v1 - v0, v2 - v0)
    gn = (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True),
                         1e-20)).astype(np.float32)

    F = len(tris)
    uv0 = np.zeros((F, 2), np.float32)
    uv1 = np.zeros((F, 2), np.float32)
    uv2 = np.zeros((F, 2), np.float32)
    # UVs on the occluder: u = (x + 0.8) / 1.6 (v constant 0.5 — the mask
    # varies along u only).
    for k, (a, b, c) in enumerate(occ):
        ti = F - 2 + k
        for uv, p in ((uv0, a), (uv1, b), (uv2, c)):
            uv[ti] = ((p[0] + 0.8) / 1.6, 0.5)

    attrs = dict(
        n0=gn, n1=gn, n2=gn, uv0=uv0, uv1=uv1, uv2=uv2,
        mat_id=mat_id, light_id=np.full(F, -1, np.int32),
        inst_id=np.zeros(F, np.int32), local_id=np.arange(F, dtype=np.int32),
    )
    emit_intensity = (18.0, 14.0, 9.0)
    base = dict(ks=(0, 0, 0), tf=(0, 0, 0), ns=1.0, ior=1.0,
                emit=(0, 0, 0), kd_tex=-1, bump_tex=-1, mask_tex=-1)
    mat_rows = [
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.76, 0.75, 0.5)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.63, 0.06, 0.04)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.15, 0.48, 0.09)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.78, 0.78, 0.78),
             emit=emit_intensity),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.7, 0.7, 0.7), mask_tex=0),
    ]
    light_rows = []
    for ti in np.nonzero(mat_id == 3)[0]:
        nn = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
        area = 0.5 * np.linalg.norm(nn)
        attrs["light_id"][ti] = len(light_rows)
        light_rows.append(
            dict(kind=light_mod.LIGHT_TRI, p0=v0[ti], p1=v1[ti], p2=v2[ti],
                 normal=nn / (2 * area), intensity=emit_intensity, area=area)
        )
    # Mask: 64x4, black left half (transparent), white right (opaque).
    mask_img = np.zeros((4, 64, 3), np.float32)
    mask_img[:, 32:] = 1.0
    scene = assemble_device_scene(v0, v1, v2, attrs, mat_rows, light_rows,
                                  [mask_img], None)
    meta = SceneMeta(
        name="procedural_masked",
        num_tris=F, num_materials=len(mat_rows), num_lights=len(light_rows),
        num_textures=1, has_env=False, has_masks=True,
        cam_pos=(0.0, 1.0, 3.6), cam_dir=(0.0, 0.0, -1.0),
        cam_up=(0.0, 1.0, 0.0), bvh_stats=scene.bvh_stats,
    )
    return scene, meta


def make_bumped_scene():
    """Cornell-like box whose floor carries a bump texture: a linear
    height ramp along u (so the central-difference slope is the exact
    constant `vscale`, materials.h:37-54 / render/surface._bump_normal).
    Floor UVs: u = (x+1)/2, v = (z+1)/2."""
    tris = []
    white = 0

    def add(quads, mat):
        for t in quads:
            tris.append((*t, mat))

    floor = _quad((-1, 0, 1), (1, 0, 1), (1, 0, -1), (-1, 0, -1))
    add(floor, 4)                                                           # bumped floor
    add(_quad((-1, 2, -1), (1, 2, -1), (1, 2, 1), (-1, 2, 1)), white)       # ceiling
    add(_quad((-1, 0, -1), (1, 0, -1), (1, 2, -1), (-1, 2, -1)), white)     # back
    add(_quad((-1, 0, 1), (-1, 0, -1), (-1, 2, -1), (-1, 2, 1)), 1)         # left
    add(_quad((1, 0, -1), (1, 0, 1), (1, 2, 1), (1, 2, -1)), 2)             # right
    add(_quad((-0.3, 1.99, -0.3), (0.3, 1.99, -0.3), (0.3, 1.99, 0.3),
              (-0.3, 1.99, 0.3)), 3)                                        # light

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat_id = np.asarray([t[3] for t in tris], np.int32)
    n = np.cross(v1 - v0, v2 - v0)
    gn = (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True),
                         1e-20)).astype(np.float32)

    F = len(tris)
    uv0 = np.zeros((F, 2), np.float32)
    uv1 = np.zeros((F, 2), np.float32)
    uv2 = np.zeros((F, 2), np.float32)
    for k, (a, b, c) in enumerate(floor):
        for uv, p in ((uv0, a), (uv1, b), (uv2, c)):
            uv[k] = ((p[0] + 1.0) / 2.0, (p[2] + 1.0) / 2.0)

    attrs = dict(
        n0=gn, n1=gn, n2=gn, uv0=uv0, uv1=uv1, uv2=uv2,
        mat_id=mat_id, light_id=np.full(F, -1, np.int32),
        inst_id=np.zeros(F, np.int32), local_id=np.arange(F, dtype=np.int32),
    )
    emit_intensity = (18.0, 14.0, 9.0)
    base = dict(ks=(0, 0, 0), tf=(0, 0, 0), ns=1.0, ior=1.0,
                emit=(0, 0, 0), kd_tex=-1, bump_tex=-1, mask_tex=-1)
    mat_rows = [
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.76, 0.75, 0.5)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.63, 0.06, 0.04)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.15, 0.48, 0.09)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.78, 0.78, 0.78),
             emit=emit_intensity),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.7, 0.7, 0.7), bump_tex=0),
    ]
    light_rows = []
    for ti in np.nonzero(mat_id == 3)[0]:
        nn = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
        area = 0.5 * np.linalg.norm(nn)
        attrs["light_id"][ti] = len(light_rows)
        light_rows.append(
            dict(kind=light_mod.LIGHT_TRI, p0=v0[ti], p1=v1[ti], p2=v2[ti],
                 normal=nn / (2 * area), intensity=emit_intensity, area=area)
        )
    # Bump height: linear ramp along x (u), constant along y — bilinear
    # sampling of a linear ramp is exact, so ds/du == 1 everywhere away
    # from the wrap seam.
    w = 64
    ramp = np.broadcast_to(
        (np.arange(w, dtype=np.float32) / (w - 1))[None, :, None], (4, w, 3)
    ).copy()
    scene = assemble_device_scene(v0, v1, v2, attrs, mat_rows, light_rows,
                                  [ramp], None)
    meta = SceneMeta(
        name="procedural_bumped",
        num_tris=F, num_materials=len(mat_rows), num_lights=len(light_rows),
        num_textures=1, has_env=False, has_masks=False, has_bump=True,
        cam_pos=(0.0, 1.0, 3.6), cam_dir=(0.0, 0.0, -1.0),
        cam_up=(0.0, 1.0, 0.0), bvh_stats=scene.bvh_stats,
    )
    return scene, meta


def make_big_scene(num_boxes: int = 4000, seed: int = 0):
    """A large procedural scene (~50k triangles at the default) for
    big-BVH traversal testing and perf work: a field of rotated boxes in
    an enclosure with one area light.  Stands in for sponza-scale scenes
    (the reference checkout ships no large OBJ assets)."""
    rs = np.random.RandomState(seed)
    tris = []
    white, red, green, lightm = 0, 1, 2, 3
    S = 40.0

    def add(quads, mat):
        for t in quads:
            tris.append((*t, mat))

    add(_quad((-S, 0, S), (S, 0, S), (S, 0, -S), (-S, 0, -S)), white)  # floor
    add(_quad((-8, 39.9, -8), (8, 39.9, -8), (8, 39.9, 8), (-8, 39.9, 8)), lightm)

    for _ in range(num_boxes):
        c = (rs.uniform(-S, S), rs.uniform(0.2, 12.0), rs.uniform(-S, S))
        sz = tuple(rs.uniform(0.2, 1.5, 3))
        _add_box(tris, center=c, size=sz, angle_deg=rs.uniform(0, 360),
                 mat=int(rs.choice([white, red, green])))

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat_id = np.asarray([t[3] for t in tris], np.int32)
    n = np.cross(v1 - v0, v2 - v0)
    gn = (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)).astype(np.float32)

    F = len(tris)
    zeros2 = np.zeros((F, 2), np.float32)
    attrs = dict(
        n0=gn, n1=gn, n2=gn, uv0=zeros2, uv1=zeros2, uv2=zeros2,
        mat_id=mat_id, light_id=np.full(F, -1, np.int32),
        inst_id=np.zeros(F, np.int32), local_id=np.arange(F, dtype=np.int32),
    )
    emit_intensity = (600.0, 560.0, 500.0)
    base = dict(ks=(0, 0, 0), tf=(0, 0, 0), ns=1.0, ior=1.0,
                emit=(0, 0, 0), kd_tex=-1, bump_tex=-1, mask_tex=-1)
    mat_rows = [
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.7, 0.7, 0.7)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.6, 0.1, 0.05)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.1, 0.5, 0.1)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.8, 0.8, 0.8), emit=emit_intensity),
    ]
    light_rows = []
    for ti in np.nonzero(mat_id == lightm)[0]:
        nn = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
        area = 0.5 * np.linalg.norm(nn)
        attrs["light_id"][ti] = len(light_rows)
        light_rows.append(
            dict(kind=light_mod.LIGHT_TRI, p0=v0[ti], p1=v1[ti], p2=v2[ti],
                 normal=nn / (2 * area), intensity=emit_intensity, area=area)
        )
    scene = assemble_device_scene(v0, v1, v2, attrs, mat_rows, light_rows, [], None)
    meta = SceneMeta(
        name=f"procedural_big_{num_boxes}",
        num_tris=F, num_materials=len(mat_rows), num_lights=len(light_rows),
        num_textures=0, has_env=False, has_masks=False,
        cam_pos=(0.0, 14.0, 55.0), cam_dir=(0.0, -0.2, -1.0),
        cam_up=(0.0, 1.0, 0.0), bvh_stats=scene.bvh_stats,
    )
    return scene, meta


def make_leaf_scene(num_leaves: int = 6000, seed: int = 0):
    """A big alpha-masked workload: a canopy of `num_leaves` textured
    leaf cards (2 tris each, ~12k masked triangles at the default) over
    a ground plane, one area light above the canopy.

    Stands in for the reference's flagship masked scene (the sponza
    curtain, test/scenes/sponza/sponza.scene — its textures ship but the
    OBJ does not).  Each card's mask is a disc: transparent outside,
    opaque inside, so roughly (1 - pi/4) of card-crossing rays must pass
    through (core/mask.h semantics on the stream path's re-trace /
    any-hit mask rounds)."""
    rs = np.random.RandomState(seed)
    tris = []
    ground, leaf, lightm = 0, 1, 2
    S = 20.0

    def add(quads, mat):
        for t in quads:
            tris.append((*t, mat))

    add(_quad((-S, 0, S), (S, 0, S), (S, 0, -S), (-S, 0, -S)), ground)
    add(_quad((-4, 19.9, -4), (4, 19.9, -4), (4, 19.9, 4), (-4, 19.9, 4)),
        lightm)

    uvs = []
    uvs += [((0, 0), (1, 0), (1, 1)), ((0, 0), (1, 1), (0, 1))] * 2  # pad
    for _ in range(num_leaves):
        c = np.array([rs.uniform(-S, S), rs.uniform(2.0, 12.0),
                      rs.uniform(-S, S)])
        # random card orientation
        a, b = rs.randn(3), rs.randn(3)
        a /= np.linalg.norm(a)
        b -= a * np.dot(a, b)
        b /= np.linalg.norm(b)
        h = rs.uniform(0.3, 0.9)
        p00, p10 = c - a * h - b * h, c + a * h - b * h
        p11, p01 = c + a * h + b * h, c - a * h + b * h
        add(_quad(tuple(p00), tuple(p10), tuple(p11), tuple(p01)), leaf)
        uvs += [((0, 0), (1, 0), (1, 1)), ((0, 0), (1, 1), (0, 1))]

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat_id = np.asarray([t[3] for t in tris], np.int32)
    n = np.cross(v1 - v0, v2 - v0)
    gn = (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True),
                         1e-20)).astype(np.float32)

    F = len(tris)
    uv_arr = np.asarray(uvs[:F], np.float32)        # (F, 3, 2)
    attrs = dict(
        n0=gn, n1=gn, n2=gn,
        uv0=uv_arr[:, 0], uv1=uv_arr[:, 1], uv2=uv_arr[:, 2],
        mat_id=mat_id, light_id=np.full(F, -1, np.int32),
        inst_id=np.zeros(F, np.int32), local_id=np.arange(F, dtype=np.int32),
    )
    emit_intensity = (300.0, 280.0, 250.0)
    base = dict(ks=(0, 0, 0), tf=(0, 0, 0), ns=1.0, ior=1.0,
                emit=(0, 0, 0), kd_tex=-1, bump_tex=-1, mask_tex=-1)
    mat_rows = [
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.5, 0.45, 0.35)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.15, 0.45, 0.1),
             mask_tex=0),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.8, 0.8, 0.8),
             emit=emit_intensity),
    ]
    light_rows = []
    for ti in np.nonzero(mat_id == lightm)[0]:
        nn = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
        area = 0.5 * np.linalg.norm(nn)
        attrs["light_id"][ti] = len(light_rows)
        light_rows.append(
            dict(kind=light_mod.LIGHT_TRI, p0=v0[ti], p1=v1[ti], p2=v2[ti],
                 normal=nn / (2 * area), intensity=emit_intensity, area=area)
        )
    # Disc mask: opaque (white) inside radius 0.5 of the card centre.
    m = 64
    yy, xx = np.mgrid[0:m, 0:m]
    disc = (((xx + 0.5) / m - 0.5) ** 2 + ((yy + 0.5) / m - 0.5) ** 2
            <= 0.25)
    mask_img = np.where(disc[..., None], 1.0, 0.0).astype(np.float32)
    mask_img = np.broadcast_to(mask_img, (m, m, 3)).copy()
    scene = assemble_device_scene(v0, v1, v2, attrs, mat_rows, light_rows,
                                  [mask_img], None)
    meta = SceneMeta(
        name=f"procedural_leaves_{num_leaves}",
        num_tris=F, num_materials=len(mat_rows), num_lights=len(light_rows),
        num_textures=1, has_env=False, has_masks=True,
        cam_pos=(0.0, 6.0, 28.0), cam_dir=(0.0, -0.1, -1.0),
        cam_up=(0.0, 1.0, 0.0), bvh_stats=scene.bvh_stats,
    )
    return scene, meta


def make_still_life_like(num_objects: int = 8300, num_cards: int = 400,
                         seed: int = 3, with_env: bool = True,
                         specular_share: bool = True):
    """Config-2/4 proxy workload (BASELINE.json; the real still_life.obj is
    absent from the reference checkout — only its .scene/.mtl ship).

    Exercises everything the north-star configs name at once: the FULL
    material set (diffuse, mirror, glass, glossy, phong, Oren-Nayar —
    reference materials.h kinds), an HDR environment light with a bright
    sun disc (importance sampling matters, light.h:412-470), an area
    light, and an alpha-masked foliage patch — at >=100k triangles, sized
    for 1920x1080 rendering (reference workload definitions:
    test/run_bench.py:58-111, configs 2/4/5).

    `with_env`/`specular_share`/`num_cards=0` toggle the env light, the
    non-diffuse material kinds, and the masked cards — bisect knobs for
    the still_life VCM-family remote-compile failure (bench_r4.csv)."""
    rs = np.random.RandomState(seed)
    tris = []
    S = 30.0
    (floor_m, white, red, green, mirror_m, glass_m, glossy_m, phong_m,
     onayar_m, leaf_m, lightm) = range(11)

    def add(quads, mat):
        for t in quads:
            tris.append((*t, mat))

    # Open ground plane (Oren-Nayar floor) under an env sky.
    add(_quad((-S, 0, S), (S, 0, S), (S, 0, -S), (-S, 0, -S)), floor_m)
    # One floating area panel (config 5 wants area + env together).
    add(_quad((-4, 24.0, -4), (4, 24.0, -4), (4, 24.0, 4), (-4, 24.0, 4)),
        lightm)

    # Object field: boxes (12 tris each) drawing from the full material
    # set; specular kinds kept to a realistic minority share.
    if specular_share:
        mats = [white, red, green, mirror_m, glass_m, glossy_m, phong_m,
                onayar_m]
        probs = [0.30, 0.14, 0.14, 0.08, 0.08, 0.10, 0.08, 0.08]
    else:
        mats, probs = [white, red, green], [0.5, 0.25, 0.25]
    for _ in range(num_objects):
        c = (rs.uniform(-S, S), rs.uniform(0.2, 8.0), rs.uniform(-S, S))
        sz = tuple(rs.uniform(0.2, 1.2, 3))
        _add_box(tris, center=c, size=sz, angle_deg=rs.uniform(0, 360),
                 mat=int(rs.choice(mats, p=probs)))

    # Masked foliage patch (disc-mask cards, see make_leaf_scene).
    n_before = len(tris)
    for _ in range(num_cards):
        c = np.array([rs.uniform(-S, S), rs.uniform(6.0, 12.0),
                      rs.uniform(-S, S)])
        a, b = rs.randn(3), rs.randn(3)
        a /= np.linalg.norm(a)
        b -= a * np.dot(a, b)
        b /= np.linalg.norm(b)
        h = rs.uniform(0.4, 1.0)
        p00, p10 = c - a * h - b * h, c + a * h - b * h
        p11, p01 = c + a * h + b * h, c - a * h + b * h
        add(_quad(tuple(p00), tuple(p10), tuple(p11), tuple(p01)), leaf_m)

    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    mat_id = np.asarray([t[3] for t in tris], np.int32)
    n = np.cross(v1 - v0, v2 - v0)
    gn = (n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True),
                         1e-20)).astype(np.float32)

    F = len(tris)
    uv0 = np.zeros((F, 2), np.float32)
    uv1 = np.zeros((F, 2), np.float32)
    uv2 = np.zeros((F, 2), np.float32)
    # Card UVs (two tris per card, same unwrap as make_leaf_scene).
    card_uv = [((0, 0), (1, 0), (1, 1)), ((0, 0), (1, 1), (0, 1))]
    for k in range(n_before, F):
        for uv, val in zip((uv0, uv1, uv2), card_uv[(k - n_before) % 2]):
            uv[k] = val

    attrs = dict(
        n0=gn, n1=gn, n2=gn, uv0=uv0, uv1=uv1, uv2=uv2,
        mat_id=mat_id, light_id=np.full(F, -1, np.int32),
        inst_id=np.zeros(F, np.int32), local_id=np.arange(F, dtype=np.int32),
    )
    emit_intensity = (400.0, 380.0, 330.0)
    base = dict(ks=(0, 0, 0), tf=(0, 0, 0), ns=1.0, ior=1.0,
                emit=(0, 0, 0), kd_tex=-1, bump_tex=-1, mask_tex=-1)
    mat_rows = [
        dict(base, kind=mat_mod.MAT_OREN_NAYAR, kd=(0.55, 0.5, 0.42),
             ns=20.0),                                          # floor
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.7, 0.7, 0.7)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.6, 0.1, 0.05)),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.1, 0.5, 0.1)),
        dict(base, kind=mat_mod.MAT_MIRROR, kd=(0, 0, 0),
             ks=(0.9, 0.9, 0.9), ns=1000.0),
        dict(base, kind=mat_mod.MAT_GLASS, kd=(0, 0, 0), ks=(1, 1, 1),
             tf=(1, 1, 1), ior=1.5),
        dict(base, kind=mat_mod.MAT_GLOSSY, kd=(0.3, 0.25, 0.1),
             ks=(0.6, 0.6, 0.6), ns=80.0),
        dict(base, kind=mat_mod.MAT_PHONG, kd=(0.2, 0.2, 0.45),
             ks=(0.5, 0.5, 0.5), ns=30.0),
        dict(base, kind=mat_mod.MAT_OREN_NAYAR, kd=(0.5, 0.35, 0.2),
             ns=40.0),
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.15, 0.45, 0.1),
             mask_tex=0),                                       # leaf cards
        dict(base, kind=mat_mod.MAT_DIFFUSE, kd=(0.8, 0.8, 0.8),
             emit=emit_intensity),
    ]
    if not specular_share:               # bisect: all-diffuse variant
        mat_rows[floor_m] = dict(base, kind=mat_mod.MAT_DIFFUSE,
                                 kd=(0.55, 0.5, 0.42))
    light_rows = []
    for ti in np.nonzero(mat_id == lightm)[0]:
        nn = np.cross(v1[ti] - v0[ti], v2[ti] - v0[ti])
        area = 0.5 * np.linalg.norm(nn)
        attrs["light_id"][ti] = len(light_rows)
        light_rows.append(
            dict(kind=light_mod.LIGHT_TRI, p0=v0[ti], p1=v1[ti], p2=v2[ti],
                 normal=nn / (2 * area), intensity=emit_intensity, area=area)
        )

    # HDR sky: horizon-to-zenith gradient + a bright sun disc (concentrated
    # energy so env importance sampling is load-bearing, light.h:412-470).
    env = None
    if with_env:
        from ..render.envmap import build_envmap

        eh, ew = 64, 128
        tt = (np.arange(eh, dtype=np.float32) + 0.5) / eh      # 0=up pole
        sky = np.zeros((eh, ew, 3), np.float32)
        zen = np.array([0.25, 0.45, 0.9], np.float32)
        hor = np.array([0.9, 0.8, 0.7], np.float32)
        sky[:] = zen[None, None] * (1 - tt)[:, None, None] + \
            hor[None, None] * tt[:, None, None]
        # Sun at ~40 deg elevation: small, ~200x the sky radiance.
        sy, sx = int(eh * 0.28), int(ew * 0.8)
        sky[max(sy - 1, 0): sy + 2, max(sx - 1, 0): sx + 2] = (180.0, 160.0,
                                                               120.0)
        env = build_envmap(sky, (1.0, 1.0, 1.0))
        light_rows.append(dict(kind=light_mod.LIGHT_ENV, intensity=(1, 1, 1)))

    # Disc mask for the cards.
    m = 64
    yy, xx = np.mgrid[0:m, 0:m]
    disc = (((xx + 0.5) / m - 0.5) ** 2 + ((yy + 0.5) / m - 0.5) ** 2
            <= 0.25)
    mask_img = np.broadcast_to(
        np.where(disc[..., None], 1.0, 0.0).astype(np.float32),
        (m, m, 3)).copy()

    scene = assemble_device_scene(v0, v1, v2, attrs, mat_rows, light_rows,
                                  [mask_img], env)
    meta = SceneMeta(
        name=f"procedural_still_life_{num_objects}",
        num_tris=F, num_materials=len(mat_rows), num_lights=len(light_rows),
        num_textures=1, has_env=with_env, has_masks=num_cards > 0,
        cam_pos=(0.0, 10.0, 42.0), cam_dir=(0.0, -0.18, -1.0),
        cam_up=(0.0, 1.0, 0.0), bvh_stats=scene.bvh_stats,
    )
    return scene, meta


def _add_box(tris, center, size, angle_deg, mat):
    cx, cy, cz = center
    sx, sy, sz = size[0] / 2, size[1] / 2, size[2] / 2
    a = np.deg2rad(angle_deg)
    c, s = np.cos(a), np.sin(a)

    def rot(p):
        x, y, z = p
        return (cx + c * x + s * z, cy + y, cz - s * x + c * z)

    # 8 corners of the unrotated box around origin.
    lo, hi = (-sx, -sy, -sz), (sx, sy, sz)
    p = {}
    for i, (x, y, z) in enumerate(
        [(lo[0], lo[1], hi[2]), (hi[0], lo[1], hi[2]), (hi[0], lo[1], lo[2]),
         (lo[0], lo[1], lo[2]), (lo[0], hi[1], hi[2]), (hi[0], hi[1], hi[2]),
         (hi[0], hi[1], lo[2]), (lo[0], hi[1], lo[2])]
    ):
        p[i] = rot((x, y, z))

    quads = [
        (p[4], p[5], p[6], p[7]),  # top
        (p[0], p[3], p[2], p[1]),  # bottom
        (p[0], p[1], p[5], p[4]),  # front
        (p[2], p[3], p[7], p[6]),  # back
        (p[1], p[2], p[6], p[5]),  # right
        (p[3], p[0], p[4], p[7]),  # left
    ]
    for q in quads:
        for t in _quad(*q):
            tris.append((*t, mat))
