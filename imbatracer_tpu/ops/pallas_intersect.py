"""Pallas TPU kernel: dense ray/triangle intersection with the whole
triangle set resident in VMEM.

This is the Pallas realisation of the dense traversal mode (see
render/traverse.py): for scenes whose triangle set fits VMEM, every ray
block tests every triangle — no gathers, no HBM geometry traffic after
the initial block load.

Mosaic-friendly structure (found by construction — several layouts abort
the TPU compiler):
- rays and outputs are TRANSPOSED (component-major, (8, R)): the ray axis
  is the lane dimension, components are sublanes, so every arithmetic op
  is a full-width (1, BLK) vector op;
- the triangle loop is statically unrolled with scalar reads at static
  indices (dynamic per-lane indexing is unsupported in Mosaic);
- no in-kernel fori_loop carries of 1D vectors.

Replaces the role of the reference's external traversal kernels for small
scenes (reference: render/scheduling/ray_queue.h:254-341).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024
PALLAS_DENSE_MAX_TRIS = 256   # static unroll budget (compile time bound)
BIG = 1e30


def _make_kernel(num_tris: int):
    def kernel(rays_ref, tris_ref, out_ref):
        ox = rays_ref[0:1, :]
        oy = rays_ref[1:2, :]
        oz = rays_ref[2:3, :]
        tmin = rays_ref[3:4, :]
        dx = rays_ref[4:5, :]
        dy = rays_ref[5:6, :]
        dz = rays_ref[6:7, :]
        tmax = rays_ref[7:8, :]

        best_t = tmax
        best_u = jnp.zeros_like(ox)
        best_v = jnp.zeros_like(ox)
        best_id = jnp.full_like(ox, -1.0)

        for t_idx in range(num_tris):
            v0x = tris_ref[t_idx, 0]
            v0y = tris_ref[t_idx, 1]
            v0z = tris_ref[t_idx, 2]
            e1x = tris_ref[t_idx, 3]
            e1y = tris_ref[t_idx, 4]
            e1z = tris_ref[t_idx, 5]
            e2x = tris_ref[t_idx, 6]
            e2y = tris_ref[t_idx, 7]
            e2z = tris_ref[t_idx, 8]
            tid = tris_ref[t_idx, 9]

            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
            tx = ox - v0x
            ty = oy - v0y
            tz = oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                (inv_det != 0.0)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (t > tmin)
                & (t < best_t)
                & (tid >= 0.0)
            )
            best_t = jnp.where(ok, t, best_t)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            best_id = jnp.where(ok, tid, best_id)

        zeros = jnp.zeros_like(best_t)
        out_ref[:, :] = jnp.concatenate(
            [best_t, best_u, best_v, best_id, zeros, zeros, zeros, zeros], axis=0
        )

    return kernel


@partial(jax.jit, static_argnames=("num_tris",))
def pallas_dense_intersect(rays8t: jnp.ndarray, tris12: jnp.ndarray, num_tris: int):
    """rays8t: (8, R) transposed ray records [ox oy oz tmin dx dy dz tmax];
    tris12: (T, 12).  R % BLK == 0.  Returns (8, R): [t u v id 0...]."""
    num_r = rays8t.shape[1]
    grid = (num_r // BLK,)
    return pl.pallas_call(
        _make_kernel(num_tris),
        out_shape=jax.ShapeDtypeStruct((8, num_r), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (tris12.shape[0], 12), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec((8, BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
    )(rays8t, tris12)


def make_tris12(bvh) -> jnp.ndarray:
    """Host-side: packed triangle array for the kernel from DeviceBvh."""
    v0 = np.asarray(bvh.tri_v0)
    e1 = np.asarray(bvh.tri_e1)
    e2 = np.asarray(bvh.tri_e2)
    tid = np.asarray(bvh.tri_id).astype(np.float32)
    num_t = v0.shape[0]
    out = np.zeros((num_t, 12), np.float32)
    out[:, 0:3] = v0
    out[:, 3:6] = e1
    out[:, 6:9] = e2
    out[:, 9] = tid
    return jnp.asarray(out)


def closest_hit_pallas(tris12, org, d, tmin, tmax):
    """Drop-in dense closest hit. org/d: (R, 3); returns a Hit tuple.
    R is padded to BLK internally."""
    from ..render.traverse import Hit

    num_r = org.shape[0]
    pad = (-num_r) % BLK
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    rays8t = jnp.stack(
        [org[:, 0], org[:, 1], org[:, 2], tmin_b,
         d[:, 0], d[:, 1], d[:, 2], tmax_b], axis=0
    )
    if pad:
        rays8t = jnp.concatenate(
            [rays8t, jnp.zeros((8, pad), jnp.float32)], axis=1
        )
    out = pallas_dense_intersect(rays8t, tris12, int(tris12.shape[0]))[:, :num_r]
    t = out[0]
    prim_id = out[3].astype(jnp.int32)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=out[1], v=out[2])
