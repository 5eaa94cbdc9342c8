"""Device-resident BVH arrays (jnp pytree) + host->device conversion.

Plays the role of the reference's one-time accel upload
(reference: render/scene.cpp:119-188, `upload_mesh_accels` via
`anydsl_copy`).  The reference uploads one layout per enabled platform;
here the *traversal mode* decides which arrays exist on device, so HBM
holds only what the selected kernel reads:

  mode "dense"  : packed triangle arrays only (small scenes; exhaustive
                  fused test, zero gathers)
  mode "stream" : super-chunk bboxes + component-major HBM tiles for the
                  streaming Pallas kernel (ops/pallas_stream.py)
  mode "stream2": like "stream" plus two-level instancing metadata
                  (accel/instancing.py; mesh tiles shared across
                  instances)
  mode "xla"    : fused (octant-ordered) node records for the threaded
                  skip-link loop (CPU backend / tests)

The packed triangle arrays are always present (dense mode, brute-force
validation, tooling).  `mode` is a static (non-pytree) field, so jitted
callers specialise on it.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from .flatten import ThreadedBvh

# Dense cutover: the fully unrolled exhaustive form grows the compiled
# program linearly in triangle count, and the axon remote-compile path
# rejects executables over protobuf's 2 GiB serialization cap — measured
# BLOWN at ~1k tris x 262k rays (results/r4_chain1.log, probe_dense_pallas
# big1k: "Core program byte size is: 2645732337").  128 keeps an ~8x
# margin; the VMEM Pallas kernel covers everything up to 8k packed tris
# with measured 144.7 Mrays/s isolated at cornell scale (r4_dense_pallas).
DENSE_MAX_TRIS = 128
# Chunked-loop dense ("densel") routing is OFF by default: measured on
# TPU it LOST badly to the pair queue at 2.2k tris (cornell VCM no-merge
# frame 4.9 s vs ~2.5 s — the fori_loop's per-iteration overhead at
# 262k-lane bodies dominates the saved machinery).  The mode remains
# implemented + tested for experiments: IMBA_DENSEL_MAX=4096.
import os as _os

DENSEL_MAX_TRIS = int(_os.environ.get("IMBA_DENSEL_MAX", "0"))

# VMEM-resident kernel (ops/pallas_vmem.py): whole feature-tile set as a
# pallas VMEM input — zero per-dispatch machinery.  Packed-count bound =
# 8 super-chunks x 1024 slots (768 KB of VMEM tiles).
VMEM_MAX_TRIS = 8 * 1024


def choose_mode(t: ThreadedBvh, backend: Optional[str] = None) -> str:
    """Pick the traversal mode for this scene + backend.

    TPU: dense for tiny scenes (exhaustive fused arithmetic beats any
    hierarchy below ~1k triangles — a dynamic gather costs a flat
    ~3.3 ms/M lanes), streaming Pallas kernel otherwise (no size cap;
    incoherent dispatches route through the pair queue, traverse.py).
    CPU (tests): the XLA skip-link loop — Mosaic kernels would need
    interpret mode and the unrolled dense form is expensive to compile.
    """
    forced = _os.environ.get("IMBA_BVH_MODE", "")
    if forced:
        # Test/profiling override (CPU vmem tests set this together with
        # pallas_vmem.INTERPRET = True).
        return forced
    if backend is None:
        backend = jax.default_backend()
    if backend != "tpu":
        return "xla"
    if t.tri_v0.shape[0] <= DENSE_MAX_TRIS:
        return "dense"
    if t.tri_v0.shape[0] <= DENSEL_MAX_TRIS:
        return "densel"
    if t.tri_v0.shape[0] <= VMEM_MAX_TRIS:
        return "vmem"
    return "stream"


@flax.struct.dataclass
class DeviceBvh:
    mode: str = flax.struct.field(pytree_node=False)
    # packed leaf-order triangles (MT form); None only for "stream2"
    tri_v0: Optional[jnp.ndarray] = None   # (P, 3) f32
    tri_e1: Optional[jnp.ndarray] = None   # (P, 3) f32
    tri_e2: Optional[jnp.ndarray] = None   # (P, 3) f32
    tri_id: Optional[jnp.ndarray] = None   # (P,) i32 flat id, -1 = padding
    # mode == "stream" / "stream2"
    sbox: Optional[jnp.ndarray] = None    # (S, 8) super-chunk bboxes
    tiles: Optional[jnp.ndarray] = None   # (T, 24, 1024) HBM feature tiles
    center: Optional[jnp.ndarray] = None  # (3,) recentring offset ("stream";
                                          # zero for "stream2" — folded into
                                          # the per-instance affines)
    # mode == "stream2" (two-level instancing, accel/instancing.py)
    tile_idx: Optional[jnp.ndarray] = None  # (1, 1, S) i32
    inst_of: Optional[jnp.ndarray] = None   # (1, 1, S) i32
    itab: Optional[jnp.ndarray] = None      # (I, 16) f32
    # mode == "xla"
    nodes64: Optional[jnp.ndarray] = None   # (N, 64) fused node+leaf record
    nodes64o: Optional[jnp.ndarray] = None  # (8N, 64) octant-ordered

    @property
    def num_nodes(self) -> int:
        if self.nodes64 is not None:
            return self.nodes64.shape[0]
        return 1

    @staticmethod
    def from_threaded(t: ThreadedBvh, mode: Optional[str] = None) -> "DeviceBvh":
        mode = mode or choose_mode(t)
        kw = dict(
            mode=mode,
            tri_v0=jnp.asarray(t.tri_v0),
            tri_e1=jnp.asarray(t.tri_e1),
            tri_e2=jnp.asarray(t.tri_e2),
            tri_id=jnp.asarray(t.tri_id),
        )
        if mode in ("stream", "vmem"):
            sbox, tiles, center = t.stream_arrays()
            kw.update(sbox=jnp.asarray(sbox), tiles=jnp.asarray(tiles),
                      center=jnp.asarray(center))
        elif mode == "xla":
            kw.update(nodes64=jnp.asarray(t.nodes64))
            if t.nodes64o is not None:
                kw.update(nodes64o=jnp.asarray(t.nodes64o))
        return DeviceBvh(**kw)

    @staticmethod
    def from_two_level(tl) -> "DeviceBvh":
        """Upload accel/instancing.TwoLevelArrays (mode "stream2")."""
        return DeviceBvh(
            mode="stream2",
            sbox=jnp.asarray(tl.sbox),
            tiles=jnp.asarray(tl.tiles),
            center=jnp.zeros(3, jnp.float32),
            tile_idx=jnp.asarray(tl.tile_idx),
            inst_of=jnp.asarray(tl.inst_of),
            itab=jnp.asarray(tl.itab),
        )
