"""Monte-Carlo sampling primitives, fully batched.

Functional parity with the reference's sampler set
(reference: render/random.h:57-188): orthonormal basis construction,
cosine / power-cosine / uniform hemisphere, uniform sphere / triangle /
cone, concentric disc, and luminance-based Russian roulette.

All functions take uniform numbers of shape (...,) and return directions
of shape (..., 3) in the *local* frame (z = normal) unless noted, plus the
solid-angle pdf.  Branchless; safe under jit/vmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import dot3, luminance, normalize

PI = jnp.pi
INV_PI = 1.0 / jnp.pi


def local_coordinates(n):
    """Branchless ONB (Duff et al. 2017) from a unit normal.

    Returns (tangent, bitangent) with [t, b, n] right-handed.  Replaces the
    reference's sign-based construction (reference: render/random.h:57-72).
    """
    s = jnp.where(n[..., 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (s + n[..., 2])
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        [1.0 + s * n[..., 0] * n[..., 0] * a, s * b, -s * n[..., 0]], axis=-1
    )
    bt = jnp.stack([b, s + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return t, bt


def to_world(local_dir, n):
    """Transform a local-frame (z = n) direction to world space."""
    t, b = local_coordinates(n)
    return (
        local_dir[..., 0:1] * t
        + local_dir[..., 1:2] * b
        + local_dir[..., 2:3] * n
    )


def to_local(world_dir, n):
    """Transform a world direction into the local frame (z = n)."""
    t, b = local_coordinates(n)
    return jnp.stack(
        [
            jnp.sum(world_dir * t, axis=-1),
            jnp.sum(world_dir * b, axis=-1),
            jnp.sum(world_dir * n, axis=-1),
        ],
        axis=-1,
    )


def sample_cos_hemisphere(u1, u2):
    """Cosine-weighted hemisphere (local frame). pdf = cos(theta)/pi."""
    phi = 2.0 * PI * u1
    r = jnp.sqrt(u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - u2))
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    pdf = z * INV_PI
    return d, pdf


def cos_hemisphere_pdf(cos_theta):
    return jnp.maximum(cos_theta, 0.0) * INV_PI


def sample_power_cos_hemisphere(power, u1, u2):
    """Phong-lobe sampling: pdf = (n+1)/(2pi) * cos^n(theta)."""
    phi = 2.0 * PI * u1
    cos_t = jnp.power(u2, 1.0 / (power + 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    d = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t], axis=-1)
    pdf = (power + 1.0) / (2.0 * PI) * jnp.power(jnp.maximum(cos_t, 1e-20), power)
    return d, pdf


def power_cos_hemisphere_pdf(power, cos_theta):
    c = jnp.maximum(cos_theta, 0.0)
    return (power + 1.0) / (2.0 * PI) * jnp.power(c, power)


def sample_uniform_hemisphere(u1, u2):
    """Uniform hemisphere (local frame). pdf = 1/(2pi)."""
    phi = 2.0 * PI * u1
    z = u2
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, jnp.full_like(u1, 1.0 / (2.0 * PI))


def uniform_hemisphere_pdf():
    return 1.0 / (2.0 * PI)


def sample_uniform_sphere(u1, u2):
    """Uniform direction on the full sphere. pdf = 1/(4pi)."""
    phi = 2.0 * PI * u1
    z = 1.0 - 2.0 * u2
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return d, jnp.full_like(u1, 1.0 / (4.0 * PI))


def uniform_sphere_pdf():
    return 1.0 / (4.0 * PI)


def sample_uniform_triangle(u1, u2):
    """Barycentric (u, v) uniform over a triangle (sqrt warp)."""
    su = jnp.sqrt(u1)
    u = 1.0 - su
    v = u2 * su
    return u, v


def sample_uniform_cone(cos_max, u1, u2):
    """Uniform direction in a cone around +z. pdf = 1/(2pi (1-cos_max))."""
    phi = 2.0 * PI * u1
    z = 1.0 - u2 * (1.0 - cos_max)
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    d = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    pdf = 1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_max, 1e-20))
    return d, jnp.broadcast_to(pdf, u1.shape)


def uniform_cone_pdf(cos_max):
    return 1.0 / (2.0 * PI * jnp.maximum(1.0 - cos_max, 1e-20))


def sample_concentric_disc(u1, u2):
    """Shirley-Chiu concentric disc mapping, branchless."""
    ox = 2.0 * u1 - 1.0
    oy = 2.0 * u2 - 1.0
    zero = (ox == 0.0) & (oy == 0.0)
    use_x = jnp.abs(ox) > jnp.abs(oy)
    r = jnp.where(use_x, ox, oy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (oy / jnp.where(ox == 0.0, 1.0, ox)),
        (PI / 2.0) - (PI / 4.0) * (ox / jnp.where(oy == 0.0, 1.0, oy)),
    )
    x = jnp.where(zero, 0.0, r * jnp.cos(theta))
    y = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return x, y


def concentric_disc_pdf():
    return INV_PI


def russian_roulette_prob(throughput):
    """Luminance-driven survival probability, clamped to [0, 1].

    Matches the reference's kill rule `kill_prob = 2 * luminance(throughput)`
    survival (reference: render/random.h:183-188).
    """
    return jnp.clip(2.0 * luminance(throughput), 0.0, 1.0)


def offset_ray_origin(pos, geom_normal, direction, scale=1e-4):
    """Nudge a ray origin off the surface along the geometric normal.

    The reference scales epsilons with ray extent (e.g. pt.cpp:131); we use a
    normal-aligned offset whose sign follows the outgoing direction.
    """
    side = jnp.sign(dot3(direction, geom_normal))
    return pos + side * scale * geom_normal


def mis_power_heuristic(pdf_a, pdf_b):
    """Balance heuristic with power 1, as used throughout the reference
    (reference: render/integrators/pt.cpp:25-27, `mis_weight = pa/(pa+pb)`)."""
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


__all__ = [
    "PI",
    "INV_PI",
    "local_coordinates",
    "to_world",
    "to_local",
    "sample_cos_hemisphere",
    "cos_hemisphere_pdf",
    "sample_power_cos_hemisphere",
    "power_cos_hemisphere_pdf",
    "sample_uniform_hemisphere",
    "uniform_hemisphere_pdf",
    "sample_uniform_sphere",
    "uniform_sphere_pdf",
    "sample_uniform_triangle",
    "sample_uniform_cone",
    "uniform_cone_pdf",
    "sample_concentric_disc",
    "concentric_disc_pdf",
    "russian_roulette_prob",
    "offset_ray_origin",
    "mis_power_heuristic",
    "normalize",
]
