"""Device-resident BVH arrays (jnp pytree) + host->device conversion.

Plays the role of the reference's one-time accel upload
(reference: render/scene.cpp:119-188, `upload_mesh_accels` via
`anydsl_copy`) — in JAX this is just `jnp.asarray` placement; sharded
placement for multi-chip is handled by the caller (scene is replicated).

The traversal loop reads only the wide records `nodes16` / `leaf48`
(one gather each per step — see accel/flatten.py for the layout); the
narrow arrays are kept for tests and tooling.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from .flatten import ThreadedBvh


from typing import Optional


@flax.struct.dataclass
class DeviceBvh:
    nodes64: jnp.ndarray     # (N, 64) f32 fused node+leaf record
    nodes64o: Optional[jnp.ndarray]  # (8N, 64) octant-ordered (None if huge)
    sbox: jnp.ndarray        # (S, 8) super-chunk bboxes (Pallas kernel)
    cbox: jnp.ndarray        # (C, 8) chunk bboxes (Pallas kernel)
    tris12: jnp.ndarray      # (C*16, 12) chunk-ordered triangles
    nodes16: jnp.ndarray     # (N, 16) f32 wide node record
    leaf48: jnp.ndarray      # (L, 48) f32 wide leaf record
    node_min: jnp.ndarray    # (N, 3) f32
    node_max: jnp.ndarray    # (N, 3) f32
    hit_link: jnp.ndarray    # (N,) i32
    miss_link: jnp.ndarray   # (N,) i32
    leaf_start: jnp.ndarray  # (N,) i32 (-1 for inner nodes)
    tri_v0: jnp.ndarray      # (P, 3) f32 packed leaf packets
    tri_e1: jnp.ndarray      # (P, 3) f32
    tri_e2: jnp.ndarray      # (P, 3) f32
    tri_id: jnp.ndarray      # (P,) i32 flat primitive id, -1 = padding

    @staticmethod
    def from_threaded(t: ThreadedBvh) -> "DeviceBvh":
        return DeviceBvh(
            nodes64=jnp.asarray(t.nodes64),
            nodes64o=None if t.nodes64o is None else jnp.asarray(t.nodes64o),
            sbox=jnp.asarray(t.sbox),
            cbox=jnp.asarray(t.cbox),
            tris12=jnp.asarray(t.tris12),
            nodes16=jnp.asarray(t.nodes16),
            leaf48=jnp.asarray(t.leaf48),
            node_min=jnp.asarray(t.node_min),
            node_max=jnp.asarray(t.node_max),
            hit_link=jnp.asarray(t.hit_link),
            miss_link=jnp.asarray(t.miss_link),
            leaf_start=jnp.asarray(t.leaf_start),
            tri_v0=jnp.asarray(t.tri_v0),
            tri_e1=jnp.asarray(t.tri_e1),
            tri_e2=jnp.asarray(t.tri_e2),
            tri_id=jnp.asarray(t.tri_id),
        )
