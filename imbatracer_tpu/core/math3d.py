"""Host-side (NumPy) matrix/transform helpers for scene building.

Covers the subset of the reference's float4x4 / float3x4 toolbox that scene
construction and cameras actually need (reference: core/float4x4.h:32-197,
core/float3x4.h:10-56): perspective, translate/scale/euler-rotate, inverse,
point/vector/normal transforms, and bbox transforms.  Device code never
touches these — instances are flattened to world space at build time.
"""

from __future__ import annotations

import numpy as np


def translate(t) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[:3, 3] = t
    return m


def scale(s) -> np.ndarray:
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[1, 1], m[2, 2] = s
    return m


def rotate_x(deg: float) -> np.ndarray:
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4, dtype=np.float64)
    m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    return m


def rotate_y(deg: float) -> np.ndarray:
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def rotate_z(deg: float) -> np.ndarray:
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4, dtype=np.float64)
    m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    return m


def euler(rx: float, ry: float, rz: float) -> np.ndarray:
    """Euler-angle rotation in degrees, X then Y then Z, matching the
    `.scene` `rot` directive (reference: frontend/build_scene.cpp:497-505)."""
    return rotate_z(rz) @ rotate_y(ry) @ rotate_x(rx)


def instance_matrix(pos, scl, rot_deg) -> np.ndarray:
    """pos/scale/rot (Euler degrees) -> world transform for an instance."""
    return translate(pos) @ euler(*rot_deg) @ scale(scl)


def transform_points(m: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """Apply a 4x4 to an (N, 3) array of points."""
    return pts @ m[:3, :3].T + m[:3, 3]


def transform_vectors(m: np.ndarray, vecs: np.ndarray) -> np.ndarray:
    return vecs @ m[:3, :3].T


def transform_normals(m: np.ndarray, normals: np.ndarray) -> np.ndarray:
    """Normals transform by the inverse-transpose; renormalised."""
    inv_t = np.linalg.inv(m[:3, :3]).T
    n = normals @ inv_t.T
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(ln, 1e-20)


def look_at_basis(pos, direction, up):
    """Camera basis: returns (pos, forward, right, up) orthonormalised."""
    pos = np.asarray(pos, np.float64)
    f = np.asarray(direction, np.float64)
    f = f / np.linalg.norm(f)
    u = np.asarray(up, np.float64)
    r = np.cross(f, u)
    r = r / np.linalg.norm(r)
    u = np.cross(r, f)
    return pos, f, r, u
