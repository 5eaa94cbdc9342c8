"""Stackless threaded-BVH traversal (pure jnp; the Pallas kernel in
`ops/` shares this exact data layout).

Replaces the reference's external AnyDSL kernels
`intersect_*_masked_instanced` / `occluded_*_masked_instanced`
(reference: render/scheduling/ray_queue.h:254-341, core/traversal_interface.h)
with an on-device, branch-free per-lane state machine:

    next = bbox_hit ? hit_link : miss_link

Each iteration of the while-loop advances *every* ray one node; finished
rays idle at node == -1.  Leaf packets are a fixed 4-wide Moller-Trumbore.
Instancing is resolved at build time (world-space flattening), so a single
BVH serves the whole scene; transparency masks hook in via `alpha_fn`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..accel.device import DeviceBvh
from .intersect import BIG, ray_aabb, ray_triangle, safe_inv_dir

LEAF_WIDTH = 4


class Hit(NamedTuple):
    t: jnp.ndarray        # (R,) f32; BIG on miss
    prim_id: jnp.ndarray  # (R,) i32 flat primitive id; -1 on miss
    u: jnp.ndarray        # (R,) f32 barycentric
    v: jnp.ndarray        # (R,) f32 barycentric


def _leaf_packet_test(bvh, org, d, tmin, tmax, node, do_leaf, alpha_fn):
    """Test the 4-triangle packet of `node` for lanes where do_leaf."""
    base = jnp.where(do_leaf, bvh.leaf_start[node], 0)
    idx = base[:, None] + jnp.arange(LEAF_WIDTH, dtype=jnp.int32)[None, :]
    tv0 = bvh.tri_v0[idx]
    te1 = bvh.tri_e1[idx]
    te2 = bvh.tri_e2[idx]
    t4, u4, v4, h4 = ray_triangle(
        org[:, None, :], d[:, None, :], tv0, te1, te2, tmin[:, None], tmax[:, None]
    )
    h4 = h4 & do_leaf[:, None]
    if alpha_fn is not None:
        # Transparency-masked traversal (reference: "masked" kernel variants,
        # core/mask.h): drop hits whose alpha mask samples to transparent.
        h4 = h4 & alpha_fn(bvh.tri_id[idx], u4, v4)
    t4 = jnp.where(h4, t4, BIG)
    return idx, t4, u4, v4, h4


@partial(jax.jit, static_argnames=("alpha_fn",))
def closest_hit(
    bvh: DeviceBvh,
    org: jnp.ndarray,
    d: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    alpha_fn: Optional[Callable] = None,
    active: Optional[jnp.ndarray] = None,
) -> Hit:
    """Closest-hit traversal for a batch of rays.

    org/d: (R, 3); tmin/tmax: scalar or (R,).  Lanes where `active` is
    False skip traversal entirely (start at the terminal node).
    """
    num_r = org.shape[0]
    # Adding a zeros term derived from `org` keeps tmin/tmax device-varying
    # under shard_map even when callers pass plain scalars.
    vary = jnp.zeros_like(org[:, 0])
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,)) + vary
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,)) + vary
    inv_d = safe_inv_dir(d)
    # Derive loop-carry inits from the inputs (zeros_like etc.) so they
    # inherit device-varying-ness under shard_map.
    zero_i = jnp.zeros_like(tmin, dtype=jnp.int32)
    start = zero_i
    if active is not None:
        start = jnp.where(active, start, -1)

    init = (
        start,                                      # current node
        jnp.asarray(tmax),                          # best t (doubles as ray tmax)
        zero_i - 1,                                 # best packed-slot index
        jnp.zeros_like(tmin),                       # u
        jnp.zeros_like(tmin),                       # v
    )

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        node_raw, best_t, best_slot, best_u, best_v = state
        active = node_raw >= 0
        node = jnp.maximum(node_raw, 0)

        box_hit = (
            ray_aabb(org, inv_d, bvh.node_min[node], bvh.node_max[node], tmin, best_t)
            & active
        )
        do_leaf = box_hit & (bvh.leaf_start[node] >= 0)
        idx, t4, u4, v4, _ = _leaf_packet_test(
            bvh, org, d, tmin, best_t, node, do_leaf, alpha_fn
        )
        k = jnp.argmin(t4, axis=-1)
        take = lambda a: jnp.take_along_axis(a, k[:, None], axis=-1)[:, 0]
        tk = take(t4)
        closer = tk < best_t
        best_t = jnp.where(closer, tk, best_t)
        best_slot = jnp.where(closer, take(idx).astype(jnp.int32), best_slot)
        best_u = jnp.where(closer, take(u4), best_u)
        best_v = jnp.where(closer, take(v4), best_v)

        nxt = jnp.where(box_hit, bvh.hit_link[node], bvh.miss_link[node])
        node_raw = jnp.where(active, nxt, -1)
        return node_raw, best_t, best_slot, best_u, best_v

    _, t, slot, u, v = jax.lax.while_loop(cond, body, init)
    prim_id = jnp.where(slot >= 0, bvh.tri_id[jnp.maximum(slot, 0)], -1)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=u, v=v)


@partial(jax.jit, static_argnames=("alpha_fn",))
def any_hit(
    bvh: DeviceBvh,
    org: jnp.ndarray,
    d: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    alpha_fn: Optional[Callable] = None,
    active: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Occlusion query: True where *any* primitive blocks (tmin, tmax).

    Early-outs per lane the moment an occluder is found (the reference's
    `occluded_*` kernels, ray_queue.h:296-343).
    """
    num_r = org.shape[0]
    # Adding a zeros term derived from `org` keeps tmin/tmax device-varying
    # under shard_map even when callers pass plain scalars.
    vary = jnp.zeros_like(org[:, 0])
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,)) + vary
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,)) + vary
    inv_d = safe_inv_dir(d)
    start = jnp.zeros_like(tmin, dtype=jnp.int32)
    if active is not None:
        start = jnp.where(active, start, -1)

    init = (start, jnp.zeros_like(tmin, dtype=jnp.bool_))

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        node_raw, occluded = state
        active = node_raw >= 0
        node = jnp.maximum(node_raw, 0)
        box_hit = (
            ray_aabb(org, inv_d, bvh.node_min[node], bvh.node_max[node], tmin, tmax)
            & active
        )
        do_leaf = box_hit & (bvh.leaf_start[node] >= 0)
        _, _, _, _, h4 = _leaf_packet_test(bvh, org, d, tmin, tmax, node, do_leaf, alpha_fn)
        found = jnp.any(h4, axis=-1)
        occluded = occluded | found

        nxt = jnp.where(box_hit, bvh.hit_link[node], bvh.miss_link[node])
        node_raw = jnp.where(active & ~found, nxt, -1)
        return node_raw, occluded

    _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded
