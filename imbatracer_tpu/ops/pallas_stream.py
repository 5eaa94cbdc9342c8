"""Pallas TPU kernel: HBM-streamed ray-stream traversal (the round-2
big-scene path; removes the VMEM-resident chunked kernel's 80k-triangle
cap).

Plays the role of the reference's external traversal kernels
(reference: render/scheduling/ray_queue.h:254-341) for arbitrarily large
scenes.  Design, driven by measured TPU behaviour (scripts/probe_mosaic.py):

* Triangles live in HBM as per-super-chunk *tiles* of 1024 triangles in
  BVH-leaf (DFS) order, stored **component-major** (components on
  sublanes, triangles on lanes) so the tile is dense and 128-lane
  aligned — Mosaic pads narrow minor dims to 128 and refuses unaligned
  DMA slices, so an AoS (tri, 12) layout would waste 10.7x HBM/DMA.
  One tile is a single 96 KB DMA, double-buffered; **no VMEM residency
  cap**.
* Per ray block (BLK rays) the *candidate super-chunk list* is computed
  OUTSIDE the kernel with flat vectorised slab tests (no gathers) and
  sorted front-to-back by entry t so the kernel's shrinking best-t kills
  far candidates early.  Lists ride in SMEM; the kernel walks them with
  a dynamic-bound fori (3.9 ns/iter measured).
* All in-kernel math runs rays-on-sublanes x entities-on-lanes:
  chunk culling is one (BLK, 64) slab test; Moller-Trumbore runs per
  *group* of 128 triangles as (BLK, 128) ops (full lane utilisation,
  and exactly the ray-major orientation an MXU feature-matmul upgrade
  needs).  Groups are skipped via scalar compaction into an SMEM list —
  a per-group `pl.when(jnp.any(...))` costs ~146 ns (measured), the
  compaction pattern ~10 ns.

Data layouts:
  raysT  : (R, 8)  [ox oy oz tmin dx dy dz tmax] rows=rays, R % BLK == 0
  sbox   : (S, 8)  super-chunk bboxes [lo.xyz, hi.xyz, pad2]
  tiles  : (S, 24, 1024) per-super-chunk tile, lanes = triangle slot:
              rows 0..9   v0.x v0.y v0.z e1.x e1.y e1.z e2.x e2.y e2.z id
              row  10     reserved (alpha-mask texture id)
              row  11     reserved
              rows 12..17 chunk bboxes lo.x lo.y lo.z hi.x hi.y hi.z in
                          lanes 0..63 (chunk c = triangle lanes 16c..16c+15)
              rows 18..23 reserved
  out    : (R, 8)  [t u v id 0...] rows=rays
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 512
CHUNK = 16
SUPER = 64
GROUP = 128                       # triangles per MT dispatch
NGROUP = CHUNK * SUPER // GROUP   # 8 groups per tile
TRI_ROWS = CHUNK * SUPER          # 1024 triangles per tile
TILE_ROWS = 24
BIG = 1e30


# --------------------------------------------------------------------------
# Host-side tile packing
# --------------------------------------------------------------------------

def pack_stream_tiles(tri_v0, tri_e1, tri_e2, tri_id):
    """(sbox (S,8), tiles (S,24,1024)) from packed-leaf-order triangles.

    Triangles arrive in BVH DFS order (spatially coherent); padding slots
    have id -1 and degenerate far-away geometry."""
    from ..accel.flatten import pack_chunks

    sbox, cbox, tris12 = pack_chunks(tri_v0, tri_e1, tri_e2, tri_id)
    num_s = sbox.shape[0]
    tiles = np.zeros((num_s, TILE_ROWS, TRI_ROWS), np.float32)
    t = tris12.reshape(num_s, TRI_ROWS, 12)
    for c in range(10):           # v0(3) e1(3) e2(3) id(1), component-major
        tiles[:, c, :] = t[:, :, c]
    cb = cbox.reshape(num_s, SUPER, 8)
    for c in range(6):
        tiles[:, 12 + c, :SUPER] = cb[:, :, c]
    # Empty-chunk padding boxes are (+BIG, -BIG) from pack_chunks; lanes
    # SUPER.. of the bbox rows are zero and never read (slices stop at 64).
    return sbox, tiles


# --------------------------------------------------------------------------
# XLA-side candidate lists (per ray block)
# --------------------------------------------------------------------------

def _safe_inv(x):
    s = jnp.where(x >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(x), 1e-12)


def superchunk_candidates(rays8t, sbox):
    """Per-block candidate super-chunks, sorted front-to-back.

    Returns (slist (B,1,S) i32, scount (B,1,1) i32): slist[b,0,:scount[b]]
    are the super-chunks any ray of block b can hit, ordered by the
    block-min entry t.  Vectorised slab tests in groups of 8 super-chunks
    (bounds the (G, R) intermediates; no data-dependent shapes).  The 3-D
    shapes exist because Mosaic requires the last two dims of a block to
    be full (or 8/128-aligned): the per-grid-step dim must lead."""
    num_s = sbox.shape[0]
    num_r = rays8t.shape[1]
    num_b = num_r // BLK
    G = 8
    pad_s = (-num_s) % G
    if pad_s:
        empty = jnp.concatenate(
            [jnp.full((pad_s, 3), BIG), jnp.full((pad_s, 3), -BIG),
             jnp.zeros((pad_s, 2))], axis=1
        ).astype(jnp.float32)
        sbox = jnp.concatenate([sbox, empty], axis=0)

    o = rays8t[0:3][None]                      # (1, 3, R)
    inv = _safe_inv(rays8t[4:7])[None]         # (1, 3, R)
    tmin = rays8t[3][None]                     # (1, R)
    tmax = rays8t[7][None]

    hit_rows = []
    key_rows = []
    for g in range(0, num_s + pad_s, G):
        lo = sbox[g : g + G, 0:3][:, :, None]  # (G, 3, 1)
        hi = sbox[g : g + G, 3:6][:, :, None]
        t0 = (lo - o) * inv                    # (G, 3, R)
        t1 = (hi - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)  # (G, R)
        tf = jnp.min(jnp.maximum(t0, t1), axis=1)
        m = (tn <= tf) & (tf >= tmin) & (tn <= tmax)
        hit_rows.append(jnp.any(m.reshape(G, num_b, BLK), axis=-1))
        key = jnp.where(m, jnp.maximum(tn, 0.0), BIG)
        key_rows.append(jnp.min(key.reshape(G, num_b, BLK), axis=-1))

    hit = jnp.concatenate(hit_rows, axis=0)[:num_s].T    # (B, S)
    key = jnp.concatenate(key_rows, axis=0)[:num_s].T
    order = jnp.argsort(jnp.where(hit, key, BIG), axis=1).astype(jnp.int32)
    count = jnp.sum(hit, axis=1).astype(jnp.int32)
    return order[:, None, :], count[:, None, None]


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _ray_cols(rays_ref):
    """(BLK, 1) ray component columns + inverse directions."""
    ox = rays_ref[:, 0:1]
    oy = rays_ref[:, 1:2]
    oz = rays_ref[:, 2:3]
    tmin = rays_ref[:, 3:4]
    dx = rays_ref[:, 4:5]
    dy = rays_ref[:, 5:6]
    dz = rays_ref[:, 6:7]
    tmax = rays_ref[:, 7:8]
    sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)
    ix = sgn(dx) / jnp.maximum(jnp.abs(dx), 1e-12)
    iy = sgn(dy) / jnp.maximum(jnp.abs(dy), 1e-12)
    iz = sgn(dz) / jnp.maximum(jnp.abs(dz), 1e-12)
    return ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz


def _slab_row(sb, ox, oy, oz, ix, iy, iz):
    """Slab test vs one (1, 8) bbox row -> ((BLK,1) tn, tf)."""
    tx0 = (sb[:, 0:1] - ox) * ix
    tx1 = (sb[:, 3:4] - ox) * ix
    ty0 = (sb[:, 1:2] - oy) * iy
    ty1 = (sb[:, 4:5] - oy) * iy
    tz0 = (sb[:, 2:3] - oz) * iz
    tz1 = (sb[:, 5:6] - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return tn, tf


def _chunk_slab(tile, slot, ox, oy, oz, ix, iy, iz):
    """(BLK, 64) chunk slab test from tile rows 12..17 (lanes 0..63)."""
    lox = tile[slot, 12:13, 0:SUPER]
    loy = tile[slot, 13:14, 0:SUPER]
    loz = tile[slot, 14:15, 0:SUPER]
    hix = tile[slot, 15:16, 0:SUPER]
    hiy = tile[slot, 16:17, 0:SUPER]
    hiz = tile[slot, 17:18, 0:SUPER]
    tx0 = (lox - ox) * ix          # (BLK, 64)
    tx1 = (hix - ox) * ix
    ty0 = (loy - oy) * iy
    ty1 = (hiy - oy) * iy
    tz0 = (loz - oz) * iz
    tz1 = (hiz - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    return tn, tf


def _mt_group(tile, slot, g, ox, oy, oz, dx, dy, dz, tmin, t_limit):
    """Moller-Trumbore of triangle group g: (BLK, GROUP) ops.

    Returns (t, u, v, tid, ok), each (BLK, GROUP)."""
    # Alignment hint: without it Mosaic must assume an arbitrary lane
    # offset and emits a dynamic lane-rotate per read.
    lo = pl.multiple_of(g * GROUP, GROUP)
    v0x = tile[slot, 0:1, pl.ds(lo, GROUP)]
    v0y = tile[slot, 1:2, pl.ds(lo, GROUP)]
    v0z = tile[slot, 2:3, pl.ds(lo, GROUP)]
    e1x = tile[slot, 3:4, pl.ds(lo, GROUP)]
    e1y = tile[slot, 4:5, pl.ds(lo, GROUP)]
    e1z = tile[slot, 5:6, pl.ds(lo, GROUP)]
    e2x = tile[slot, 6:7, pl.ds(lo, GROUP)]
    e2y = tile[slot, 7:8, pl.ds(lo, GROUP)]
    e2z = tile[slot, 8:9, pl.ds(lo, GROUP)]
    tid = tile[slot, 9:10, pl.ds(lo, GROUP)]

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
        & (t < t_limit)
        & (tid >= 0.0)
    )
    return t, u, v, tid, ok


def _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref):
    """Chunk mask (BLK, 64) -> SMEM list of triangle groups to intersect.

    Group g covers chunks 8g..8g+7.  Writes per-group any-hit flags into
    gflag_ref (VMEM) then compacts with unrolled static scalar reads."""
    ci = cm.astype(jnp.int32)
    for g in range(NGROUP):
        gflag_ref[g : g + 1, 0:1] = jnp.max(
            ci[:, g * 8 : (g + 1) * 8], axis=(0, 1), keepdims=True
        )
    gcnt_ref[0] = 0
    for g in range(NGROUP):
        @pl.when(gflag_ref[g, 0] > 0)
        def _(g=g):
            glist_ref[gcnt_ref[0]] = g
            gcnt_ref[0] = gcnt_ref[0] + 1


def _make_kernel(occl: bool, instanced: bool):
    """Kernel factory: closest-hit / occlusion, optionally with two-level
    instancing (per-super-chunk instance transforms, reference:
    core/adapter.h:25-38 TopLevelAdapter + InstanceNode — here the
    "instance node" is metadata on the super-chunk: mesh tile index,
    instance id, and a (I, 16) table of world->mesh affines + flat
    primitive-id offsets).  Rays are transformed with UNNORMALISED mesh-
    space directions so the hit parameter t is identical in both spaces
    (the reference normalises and rescales, cpu_adapter.cpp:346-366; the
    unnormalised form needs no rescale and keeps best-t shared)."""

    def kernel(*refs):
        if instanced:
            (rays_ref, sbox_ref, slist_ref, scount_ref, tidx_ref, iinst_ref,
             itab_ref, tiles_ref, out_ref, acc_ref, tile_ref, gflag_ref,
             glist_ref, gcnt_ref, sem_ref) = refs
        else:
            (rays_ref, sbox_ref, slist_ref, scount_ref, tiles_ref, out_ref,
             acc_ref, tile_ref, gflag_ref, glist_ref, gcnt_ref, sem_ref) = refs

        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
        zeros = jnp.zeros_like(ox)
        if occl:
            acc_ref[:, 0:1] = zeros
        else:
            acc_ref[:, 0:1] = tmax
            acc_ref[:, 1:2] = zeros
            acc_ref[:, 2:3] = zeros
            acc_ref[:, 3:4] = zeros - 1.0

        n = scount_ref[0, 0, 0]

        def tile_dma(k, slot):
            sc = slist_ref[0, 0, k]
            ti = tidx_ref[0, 0, sc] if instanced else sc
            return pltpu.make_async_copy(
                tiles_ref.at[ti], tile_ref.at[slot], sem_ref.at[slot]
            )

        @pl.when(n > 0)
        def _():
            tile_dma(0, 0).start()

        def body(k, _):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n)
            def _():
                tile_dma(k + 1, 1 - slot).start()

            tile_dma(k, slot).wait()

            # Re-check the super-chunk (world space) against the *current*
            # best t / termination state (the candidate list was built with
            # the initial tmax; front-to-back ordering makes this prune
            # most of the tail).
            sc = slist_ref[0, 0, k]
            sb = sbox_ref[pl.ds(sc, 1), :]
            stn, stf = _slab_row(sb, ox, oy, oz, ix, iy, iz)
            if occl:
                live = ~(acc_ref[:, 0:1] > 0.0)
                s_ok = (stn <= stf) & (stf >= tmin) & (stn <= tmax) & live
            else:
                s_ok = (stn <= stf) & (stf >= tmin) & (stn <= acc_ref[:, 0:1])

            @pl.when(jnp.any(s_ok))
            def _():
                if instanced:
                    ii = iinst_ref[0, 0, sc]
                    row = itab_ref[pl.ds(ii, 1), :]       # (1, 16)
                    m = lambda c: row[:, c : c + 1]
                    cox = m(0) * ox + m(1) * oy + m(2) * oz + m(3)
                    coy = m(4) * ox + m(5) * oy + m(6) * oz + m(7)
                    coz = m(8) * ox + m(9) * oy + m(10) * oz + m(11)
                    cdx = m(0) * dx + m(1) * dy + m(2) * dz
                    cdy = m(4) * dx + m(5) * dy + m(6) * dz
                    cdz = m(8) * dx + m(9) * dy + m(10) * dz
                    sgn = lambda v: jnp.where(v >= 0.0, 1.0, -1.0)
                    cix = sgn(cdx) / jnp.maximum(jnp.abs(cdx), 1e-12)
                    ciy = sgn(cdy) / jnp.maximum(jnp.abs(cdy), 1e-12)
                    ciz = sgn(cdz) / jnp.maximum(jnp.abs(cdz), 1e-12)
                    id_off = row[:, 12:13]
                else:
                    cox, coy, coz = ox, oy, oz
                    cdx, cdy, cdz = dx, dy, dz
                    cix, ciy, ciz = ix, iy, iz
                    id_off = None

                tn, tf = _chunk_slab(tile_ref, slot, cox, coy, coz,
                                     cix, ciy, ciz)
                if occl:
                    alive = ~(acc_ref[:, 0:1] > 0.0)
                    cm = (tn <= tf) & (tf >= tmin) & (tn <= tmax) & alive
                else:
                    cm = (tn <= tf) & (tf >= tmin) & (tn <= acc_ref[:, 0:1])
                _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

                def mt_body(j, _):
                    g = glist_ref[j]
                    limit = tmax if occl else acc_ref[:, 0:1]
                    t, u, v, tid, ok = _mt_group(
                        tile_ref, slot, g, cox, coy, coz, cdx, cdy, cdz,
                        tmin, limit
                    )
                    if occl:
                        found = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1,
                                        keepdims=True)
                        acc_ref[:, 0:1] = jnp.maximum(acc_ref[:, 0:1], found)
                        return 0
                    if id_off is not None:
                        tid = tid + id_off
                    best_t = acc_ref[:, 0:1]
                    t = jnp.where(ok, t, BIG)
                    t_min = jnp.min(t, axis=1, keepdims=True)   # (BLK, 1)
                    improved = t_min < best_t
                    sel = t == t_min
                    pick = lambda a: jnp.max(
                        jnp.where(sel, a, -BIG), axis=1, keepdims=True
                    )
                    acc_ref[:, 0:1] = jnp.where(improved, t_min, best_t)
                    acc_ref[:, 1:2] = jnp.where(improved, pick(u),
                                                acc_ref[:, 1:2])
                    acc_ref[:, 2:3] = jnp.where(improved, pick(v),
                                                acc_ref[:, 2:3])
                    acc_ref[:, 3:4] = jnp.where(
                        improved, pick(tid * jnp.ones_like(u)),
                        acc_ref[:, 3:4]
                    )
                    return 0

                jax.lax.fori_loop(0, gcnt_ref[0], mt_body, 0)

            return 0

        jax.lax.fori_loop(0, n, body, 0)

        if occl:
            out_ref[:, 0:1] = acc_ref[:, 0:1]
            out_ref[:, 1:8] = jnp.concatenate([zeros] * 7, axis=1)
        else:
            out_ref[:, 0:4] = acc_ref[:, 0:4]
            out_ref[:, 4:8] = jnp.concatenate([zeros] * 4, axis=1)

    return kernel


def _stream_call(raysT, sbox, slist, scount, tiles, occl=False, inst=None):
    num_r = raysT.shape[0]
    num_s = sbox.shape[0]
    instanced = inst is not None
    in_specs = [
        pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_s, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, slist.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [raysT, sbox, slist, scount]
    if instanced:
        tidx, iinst, itab = inst
        in_specs += [
            pl.BlockSpec((1, 1, tidx.shape[2]), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, iinst.shape[2]), lambda i: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((itab.shape[0], 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [tidx, iinst, itab]
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(tiles)

    return pl.pallas_call(
        _make_kernel(occl, instanced),
        out_shape=jax.ShapeDtypeStruct((num_r, 8), jnp.float32),
        grid=(num_r // BLK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, 1 if occl else 8), jnp.float32),
            pltpu.VMEM((2, TILE_ROWS, TRI_ROWS), jnp.float32),
            pltpu.VMEM((NGROUP, 1), jnp.int32),
            pltpu.SMEM((NGROUP,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(*args)


# --------------------------------------------------------------------------
# Public wrappers (Hit-level API)
# --------------------------------------------------------------------------

def _rays8t(org, d, tmin, tmax, active):
    num_r = org.shape[0]
    pad = (-num_r) % BLK
    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    if active is not None:
        tmax_b = jnp.where(active, tmax_b, -1.0)
    rays8t = jnp.stack(
        [org[:, 0], org[:, 1], org[:, 2], tmin_b,
         d[:, 0], d[:, 1], d[:, 2], tmax_b], axis=0
    )
    if pad:
        padr = jnp.zeros((8, pad), jnp.float32)
        padr = padr.at[7, :].set(-1.0)      # inactive lanes
        rays8t = jnp.concatenate([rays8t, padr], axis=1)
    return rays8t, num_r


def closest_hit_stream(sbox, tiles, org, d, tmin, tmax, active=None,
                       inst=None):
    from ..render.traverse import Hit

    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    slist, scount = superchunk_candidates(rays8t, sbox)
    out = _stream_call(rays8t.T, sbox, slist, scount, tiles,
                       inst=inst)[:num_r]
    t = out[:, 0]
    prim_id = out[:, 3].astype(jnp.int32)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=out[:, 1], v=out[:, 2])


def any_hit_stream(sbox, tiles, org, d, tmin, tmax, active=None, inst=None):
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    slist, scount = superchunk_candidates(rays8t, sbox)
    out = _stream_call(rays8t.T, sbox, slist, scount, tiles, occl=True,
                       inst=inst)[:num_r]
    return out[:, 0] > 0.0
