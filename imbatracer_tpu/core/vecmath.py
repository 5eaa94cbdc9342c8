"""Batched 3-vector helpers over the trailing axis.

The reference's float2/3/4 operator soup (reference: core/float3.h) becomes
plain jnp arrays of shape (..., 3); these helpers keep call sites tidy and
are written to fuse into surrounding elementwise code under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def dot3(a, b):
    """Dot product keeping the trailing axis (for broadcasting against vectors)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def lensqr(a):
    return jnp.sum(a * a, axis=-1)


def normalize(a, eps=1e-20):
    return a * jax_rsqrt(jnp.maximum(jnp.sum(a * a, axis=-1, keepdims=True), eps))


def jax_rsqrt(x):
    import jax.lax as lax

    return lax.rsqrt(x)


def reflect(wo, n):
    """Mirror direction of wo about n (both pointing away from surface)."""
    return 2.0 * dot3(wo, n) * n - wo


def luminance(rgb):
    """Rec.601 luma, matching the reference (reference: core/rgb.h:17-19)."""
    return 0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2]


def is_black(rgb, eps=0.0):
    return jnp.all(rgb <= eps, axis=-1)


def where3(cond, a, b):
    """Select vectors by a (...,)-shaped boolean condition."""
    return jnp.where(cond[..., None], a, b)
