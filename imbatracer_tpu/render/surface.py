"""Surface interaction assembly from traversal hits (batched gathers).

Replaces `calculate_intersection` (reference: render/integrators/
integrator.h:71-123).  Differences from the reference are wins of the
TPU data layout: barycentric v comes straight from the traversal kernel
(the reference reconstructs it from the hit position, integrator.h:88-94),
and instancing is pre-flattened so no inverse-transform is needed at
shading time.

Conventions preserved:
- attribute lerp weights (1-u-v, u, v)
- bump mapping perturbs an ONB of the shading normal with central
  differences of the bump texture (materials.h:33-55)
- the shading normal is flipped into the geometric normal's hemisphere
  (integrator.h:115-120)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.sampling import local_coordinates
from ..core.vecmath import dot, normalize
from ..scene.textures import sample_bilinear
from . import materials as mat_mod


class SurfaceInteraction(NamedTuple):
    pos: jnp.ndarray       # (R, 3) hit position
    w_out: jnp.ndarray     # (R, 3) direction toward the origin of the ray
    normal: jnp.ndarray    # (R, 3) shading normal (bumped, hemisphere-fixed)
    gn: jnp.ndarray        # (R, 3) geometric normal
    uv: jnp.ndarray        # (R, 2) texture coordinates
    mat_id: jnp.ndarray    # (R,) i32
    light_id: jnp.ndarray  # (R,) i32 (-1 unless emitter)
    params: dict           # gathered per-ray material parameters


def make_interaction(scene, hit: Hit, org, d, has_bump: bool = False) -> SurfaceInteraction:
    """Gather per-hit shading data. `hit.prim_id` < 0 rows produce garbage
    that callers must mask; gathers are clamped so they stay in bounds."""
    prim = jnp.maximum(hit.prim_id, 0)
    attrs = scene.attrs
    w0 = (1.0 - hit.u - hit.v)[..., None]
    wu = hit.u[..., None]
    wv = hit.v[..., None]

    uv = w0 * attrs.uv0[prim] + wu * attrs.uv1[prim] + wv * attrs.uv2[prim]
    n = normalize(w0 * attrs.n0[prim] + wu * attrs.n1[prim] + wv * attrs.n2[prim])
    gn = attrs.gn[prim]
    mat_id = attrs.mat_id[prim]
    light_id = attrs.light_id[prim]

    mats = scene.materials
    kd_tex = mats.kd_tex[mat_id]
    kd = mats.kd[mat_id]
    kd = jnp.where(
        (kd_tex >= 0)[..., None],
        sample_bilinear(scene.textures, kd_tex, uv[..., 0], uv[..., 1]),
        kd,
    )
    params = mat_mod.gather_params(mats, mat_id, kd_override=kd)

    if has_bump:
        n = _bump_normal(scene, mats.bump_tex[mat_id], uv, n)

    # Shading normal must live in the geometric hemisphere
    # (integrator.h:115-120).
    n = jnp.where(dot(gn, n)[..., None] < 0.0, -n, n)

    pos = org + hit.t[..., None] * d
    return SurfaceInteraction(
        pos=pos,
        w_out=-normalize(d),
        normal=n,
        gn=gn,
        uv=uv,
        mat_id=mat_id,
        light_id=light_id,
        params=params,
    )


def _bump_normal(scene, bump_tex, uv, n):
    """Central-difference bump mapping (materials.h:37-54); du=dv=1e-3,
    vscale=0.02 as in the reference."""
    du = 1e-3
    vscale = 0.02
    u, v = uv[..., 0], uv[..., 1]
    s = lambda uu, vv: sample_bilinear(scene.textures, bump_tex, uu, vv)[..., 0]
    h0 = s(u, v)
    diff_u = vscale * (s(u + du, v) - h0) / du
    diff_v = vscale * (s(u, v + du) - h0) / du
    t, b = local_coordinates(n)
    t2 = normalize(t + diff_u[..., None] * n)
    b2 = normalize(b + diff_v[..., None] * n)
    n_bumped = normalize(jnp.cross(t2, b2))
    return jnp.where((bump_tex >= 0)[..., None], n_bumped, n)
