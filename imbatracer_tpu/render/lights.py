"""Batched light sampling over an SoA light table.

The reference's `Light` class hierarchy with `sample_emit`/`sample_direct`
virtuals (reference: render/light.h:49-359) becomes one flat table; every
light kind's formulas are evaluated branchlessly and selected by kind.
The `{radiance, cos_out, pdf_emit_w, pdf_direct_w|a}` dual-pdf contract is
preserved exactly — it is what the VCM-family MIS weights consume.

Kinds: TRI (area emitter), POINT, DIR(ectional), SPOT, ENV.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..core.sampling import (
    PI,
    concentric_disc_pdf,
    cos_hemisphere_pdf,
    sample_concentric_disc,
    sample_cos_hemisphere,
    sample_uniform_cone,
    sample_uniform_sphere,
    sample_uniform_triangle,
    to_world,
    uniform_cone_pdf,
    uniform_sphere_pdf,
)
from ..core.vecmath import dot, normalize, where3
from . import envmap as envmap_mod
from .envmap import EnvMapData

LIGHT_TRI = 0
LIGHT_POINT = 1
LIGHT_DIR = 2
LIGHT_SPOT = 3
LIGHT_ENV = 4

FAR = jnp.float32(1e30)


@flax.struct.dataclass
class LightTable:
    """SoA light storage.

    `rec` is the wide-record per-light view used by per-ray gathers (one
    (R, 24) row gather; see accel/flatten.py for the TPU rationale):
      [kind(0, i32 bits), p0(1:4), p1(4:7), p2(7:10), normal(10:13),
       intensity(13:16), area(16), cos_angle(17), pad(18:24)]
    """

    rec: jnp.ndarray        # (L, 24) f32 wide record
    kind: jnp.ndarray       # (L,) i32
    p0: jnp.ndarray         # (L, 3) tri vert / point pos / spot pos
    p1: jnp.ndarray         # (L, 3) tri vert
    p2: jnp.ndarray         # (L, 3) tri vert
    normal: jnp.ndarray     # (L, 3) tri normal / dir-light dir / spot axis
    intensity: jnp.ndarray  # (L, 3)
    area: jnp.ndarray       # (L,) triangle area
    cos_angle: jnp.ndarray  # (L,) spot cone cosine

    @property
    def count(self):
        return self.kind.shape[0]


@flax.struct.dataclass
class BSphere:
    center: jnp.ndarray    # (3,)
    radius: jnp.ndarray    # ()
    inv_radius_sqr: jnp.ndarray  # ()


class DirectSample(NamedTuple):
    """One NEE sample per ray (light.h DirectIllumSample, :51-63)."""

    dir: jnp.ndarray
    distance: jnp.ndarray
    radiance: jnp.ndarray
    cos_out: jnp.ndarray
    pdf_emit_w: jnp.ndarray
    pdf_direct_w: jnp.ndarray
    is_delta: jnp.ndarray


class EmitSample(NamedTuple):
    """One photon-emission sample (light.h EmitSample, :65-77)."""

    pos: jnp.ndarray
    dir: jnp.ndarray
    radiance: jnp.ndarray
    cos_out: jnp.ndarray
    pdf_emit_w: jnp.ndarray
    pdf_direct_a: jnp.ndarray
    is_finite: jnp.ndarray
    is_delta: jnp.ndarray


def _bits(col):
    import jax.lax

    return jax.lax.bitcast_convert_type(col, jnp.int32)


UNROLL_LIGHTS = 8


def _fetch_rows(table_rec, li):
    """Per-ray light-record fetch, TRANSPOSED to (24, R).  For small tables
    a select-chain over static rows replaces the dynamic gather (a gather
    costs a flat ~3.3 ms per 1M rays on this TPU; 8 selects are ~free);
    either way the result is component-major so the ~18 component reads
    below are contiguous row slices, not cross-lane column extracts
    (measured ~6x difference)."""
    L = table_rec.shape[0]
    if L <= UNROLL_LIGHTS:
        rec_t = jnp.broadcast_to(table_rec[0][:, None], (table_rec.shape[1],) + li.shape)
        for l in range(1, L):
            rec_t = jnp.where((li == l)[None, :], table_rec[l][:, None], rec_t)
        return rec_t
    return table_rec[li].T


def is_delta_kind(kind):
    return (kind == LIGHT_POINT) | (kind == LIGHT_DIR) | (kind == LIGHT_SPOT)


def is_finite_kind(kind):
    return (kind != LIGHT_DIR) & (kind != LIGHT_ENV)


def sample_direct(
    lights: LightTable,
    light_idx: jnp.ndarray,
    from_pos: jnp.ndarray,
    u1,
    u2,
    bsphere: BSphere,
    env: Optional[EnvMapData] = None,
) -> DirectSample:
    """Sample a point/direction on light `light_idx` for NEE shadow rays."""
    li = jnp.maximum(light_idx, 0)
    rec_t = _fetch_rows(lights.rec, li)
    kind = _bits(rec_t[0])
    p0 = rec_t[1:4].T
    p1 = rec_t[4:7].T
    p2 = rec_t[7:10].T
    n = rec_t[10:13].T
    intensity = rec_t[13:16].T
    cos_angle = rec_t[17]

    # --- TRI (light.h:145-180) -----------------------------------------
    area = rec_t[16]
    tu, tv = sample_uniform_triangle(u1, u2)
    pos = tu[..., None] * p0 + tv[..., None] * p1 + (1.0 - tu - tv)[..., None] * p2
    to_l = pos - from_pos
    distsq_t = jnp.maximum(dot(to_l, to_l), 1e-12)
    dist_t = jnp.sqrt(distsq_t)
    dir_t = to_l / dist_t[..., None]
    cos_out_t = dot(n, -dir_t)
    front = (cos_out_t > 0.0) & (cos_out_t < 1.0)
    rad_t = jnp.where(
        front[..., None], intensity * (cos_out_t * area / distsq_t)[..., None], 0.0
    )
    pdf_emit_t = jnp.where(front, cos_hemisphere_pdf(cos_out_t) / jnp.maximum(area, 1e-12), 1.0)
    pdf_dir_t = jnp.where(front, distsq_t / jnp.maximum(area * cos_out_t, 1e-12), 1.0)
    cos_out_t = jnp.where(front, cos_out_t, 1.0)

    # --- POINT (light.h:266-283) ---------------------------------------
    to_p = p0 - from_pos
    distsq_p = jnp.maximum(dot(to_p, to_p), 1e-12)
    dist_p = jnp.sqrt(distsq_p)
    dir_p = to_p / dist_p[..., None]
    rad_p = intensity / (4.0 * PI * distsq_p)[..., None]
    pdf_dir_p = distsq_p
    pdf_emit_p = jnp.broadcast_to(uniform_sphere_pdf(), distsq_p.shape)

    # --- DIR (light.h:225-238) -----------------------------------------
    dir_d = -n
    rad_d = intensity
    pdf_dir_d = jnp.ones_like(distsq_p)
    pdf_emit_d = jnp.broadcast_to(
        concentric_disc_pdf() * bsphere.inv_radius_sqr, distsq_p.shape
    )

    # --- SPOT (light.h:324-346) ----------------------------------------
    cos_o_s = -dot(dir_p, n)
    in_cone = cos_o_s >= cos_angle
    rad_s = jnp.where(in_cone[..., None], intensity / distsq_p[..., None], 0.0)
    pdf_emit_s = jnp.where(in_cone, uniform_cone_pdf(cos_angle), 0.0)
    pdf_dir_s = distsq_p

    # --- select ---------------------------------------------------------
    d = where3(kind == LIGHT_TRI, dir_t, dir_p)
    d = where3(kind == LIGHT_DIR, dir_d, d)
    dist = jnp.where(kind == LIGHT_TRI, dist_t, dist_p)
    dist = jnp.where(kind == LIGHT_DIR, FAR, dist)
    rad = where3(kind == LIGHT_TRI, rad_t, rad_p)
    rad = where3(kind == LIGHT_DIR, rad_d, rad)
    rad = where3(kind == LIGHT_SPOT, rad_s, rad)
    pdf_e = jnp.where(kind == LIGHT_TRI, pdf_emit_t, pdf_emit_p)
    pdf_e = jnp.where(kind == LIGHT_DIR, pdf_emit_d, pdf_e)
    pdf_e = jnp.where(kind == LIGHT_SPOT, pdf_emit_s, pdf_e)
    pdf_d = jnp.where(kind == LIGHT_TRI, pdf_dir_t, pdf_dir_p)
    pdf_d = jnp.where(kind == LIGHT_DIR, pdf_dir_d, pdf_d)
    pdf_d = jnp.where(kind == LIGHT_SPOT, pdf_dir_s, pdf_d)
    cos_out = jnp.where(kind == LIGHT_TRI, cos_out_t, 1.0)

    # --- ENV (light.h:519-536), python-level gate: scene-static --------
    if env is not None:
        env_dir, env_li, env_pdf = envmap_mod.sample_dir(env, u1, u2)
        is_env = kind == LIGHT_ENV
        d = where3(is_env, env_dir, d)
        dist = jnp.where(is_env, FAR, dist)
        rad = where3(is_env, env_li / jnp.maximum(env_pdf, 1e-20)[..., None], rad)
        pdf_d = jnp.where(is_env, env_pdf, pdf_d)
        pdf_e = jnp.where(
            is_env, concentric_disc_pdf() * bsphere.inv_radius_sqr * env_pdf, pdf_e
        )
        cos_out = jnp.where(is_env, 1.0, cos_out)

    return DirectSample(
        dir=d,
        distance=dist,
        radiance=rad,
        cos_out=cos_out,
        pdf_emit_w=pdf_e,
        pdf_direct_w=pdf_d,
        is_delta=is_delta_kind(kind),
    )


def sample_emit(
    lights: LightTable,
    light_idx: jnp.ndarray,
    u1,
    u2,
    u3,
    u4,
    bsphere: BSphere,
    env: Optional[EnvMapData] = None,
) -> EmitSample:
    """Sample an outgoing photon ray from light `light_idx` (light pass)."""
    li = jnp.maximum(light_idx, 0)
    rec_t = _fetch_rows(lights.rec, li)
    kind = _bits(rec_t[0])
    p0 = rec_t[1:4].T
    p1 = rec_t[4:7].T
    p2 = rec_t[7:10].T
    n = rec_t[10:13].T
    intensity = rec_t[13:16].T
    cos_angle = rec_t[17]

    # --- TRI (light.h:109-143) -----------------------------------------
    area = jnp.maximum(rec_t[16], 1e-12)
    tu, tv = sample_uniform_triangle(u1, u2)
    pos_t = tu[..., None] * p0 + tv[..., None] * p1 + (1.0 - tu - tv)[..., None] * p2
    d_loc, pdf_cos = sample_cos_hemisphere(u3, u4)
    dir_t = to_world(d_loc, n)
    cos_out_t = d_loc[..., 2]
    degen = pdf_cos <= 0.0
    rad_t = jnp.where(degen[..., None], 0.0, intensity * (area * PI)[..., None])
    pdf_emit_t = jnp.where(degen, 1.0, pdf_cos / area)
    pdf_direct_t = jnp.where(degen, 1.0, 1.0 / area)
    cos_out_t = jnp.where(degen, 0.0, cos_out_t)

    # --- POINT (light.h:249-264) ---------------------------------------
    d_sph, pdf_sph = sample_uniform_sphere(u3, u4)
    rad_p = intensity
    pdf_emit_p = pdf_sph

    # --- DIR (light.h:205-223): disc on the bounding sphere ------------
    dx, dy = sample_concentric_disc(u1, u2)
    t_dir, b_dir = _onb(n)
    pos_d = bsphere.center + bsphere.radius * (-n + b_dir * dx[..., None] + t_dir * dy[..., None])
    pdf_emit_d = concentric_disc_pdf() * bsphere.inv_radius_sqr
    rad_d = intensity / pdf_emit_d

    # --- SPOT (light.h:305-322) ----------------------------------------
    d_cone, pdf_cone = sample_uniform_cone(cos_angle, u3, u4)
    dir_s = to_world(d_cone, n)
    rad_s = intensity / pdf_cone[..., None]
    pdf_emit_s = pdf_cone

    # --- select ---------------------------------------------------------
    pos = where3(kind == LIGHT_TRI, pos_t, p0)
    pos = where3(kind == LIGHT_DIR, pos_d, pos)
    d = where3(kind == LIGHT_TRI, dir_t, d_sph)
    d = where3(kind == LIGHT_DIR, jnp.broadcast_to(n, d_sph.shape), d)
    d = where3(kind == LIGHT_SPOT, dir_s, d)
    rad = where3(kind == LIGHT_TRI, rad_t, rad_p)
    rad = where3(kind == LIGHT_DIR, rad_d, rad)
    rad = where3(kind == LIGHT_SPOT, rad_s, rad)
    pdf_e = jnp.where(kind == LIGHT_TRI, pdf_emit_t, pdf_emit_p)
    pdf_e = jnp.where(kind == LIGHT_DIR, pdf_emit_d, pdf_e)
    pdf_e = jnp.where(kind == LIGHT_SPOT, pdf_emit_s, pdf_e)
    pdf_da = jnp.where(kind == LIGHT_TRI, pdf_direct_t, 1.0)
    cos_out = jnp.where(kind == LIGHT_TRI, cos_out_t, 1.0)

    # --- ENV (light.h:494-516) ------------------------------------------
    if env is not None:
        env_dir, env_li, env_pdf = envmap_mod.sample_dir(env, u3, u4)
        inward = -env_dir
        te, be = _onb(inward)
        pos_e = bsphere.center + bsphere.radius * (
            -inward + be * dx[..., None] + te * dy[..., None]
        )
        pdf_emit_e = concentric_disc_pdf() * bsphere.inv_radius_sqr * env_pdf
        is_env = kind == LIGHT_ENV
        pos = where3(is_env, pos_e, pos)
        d = where3(is_env, inward, d)
        rad = where3(is_env, env_li / jnp.maximum(pdf_emit_e, 1e-20)[..., None], rad)
        pdf_e = jnp.where(is_env, pdf_emit_e, pdf_e)
        pdf_da = jnp.where(is_env, env_pdf, pdf_da)
        cos_out = jnp.where(is_env, 1.0, cos_out)

    return EmitSample(
        pos=pos,
        dir=normalize(d),
        radiance=rad,
        cos_out=cos_out,
        pdf_emit_w=pdf_e,
        pdf_direct_a=pdf_da,
        is_finite=is_finite_kind(kind),
        is_delta=is_delta_kind(kind),
    )


def _onb(n):
    from ..core.sampling import local_coordinates

    return local_coordinates(n)


def build_light_table(rows: list[dict]) -> LightTable:
    """Host-side table assembly from a list of per-light dicts."""
    L = max(len(rows), 1)

    def arr(key, default, width=None):
        if width is None:
            out = np.full((L,), default, np.float32)
        else:
            out = np.full((L, width), default, np.float32)
        for i, r in enumerate(rows):
            if key in r:
                out[i] = r[key]
        return out

    kind = np.full((L,), LIGHT_POINT, np.int32)
    for i, r in enumerate(rows):
        kind[i] = r["kind"]
    if not rows:
        # Dummy black point light so the table is never empty.
        kind[0] = LIGHT_POINT

    rec = np.zeros((L, 24), np.float32)
    rec[:, 0] = kind.view(np.float32)
    rec[:, 1:4] = arr("p0", 0.0, 3)
    rec[:, 4:7] = arr("p1", 0.0, 3)
    rec[:, 7:10] = arr("p2", 0.0, 3)
    rec[:, 10:13] = arr("normal", 0.0, 3)
    rec[:, 13:16] = arr("intensity", 0.0, 3)
    rec[:, 16] = arr("area", 1.0)
    rec[:, 17] = arr("cos_angle", 0.0)
    return LightTable(
        rec=jnp.asarray(rec),
        kind=jnp.asarray(kind),
        p0=jnp.asarray(arr("p0", 0.0, 3)),
        p1=jnp.asarray(arr("p1", 0.0, 3)),
        p2=jnp.asarray(arr("p2", 0.0, 3)),
        normal=jnp.asarray(arr("normal", 0.0, 3)),
        intensity=jnp.asarray(arr("intensity", 0.0, 3)),
        area=jnp.asarray(arr("area", 1.0)),
        cos_angle=jnp.asarray(arr("cos_angle", 0.0)),
    )
