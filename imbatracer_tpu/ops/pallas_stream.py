"""Pallas TPU kernel: HBM-streamed ray-stream traversal (the big-scene
path; no VMEM triangle cap).

Plays the role of the reference's external traversal kernels
(reference: render/scheduling/ray_queue.h:254-341) for arbitrarily large
scenes.  Design, driven by measured TPU behaviour (scripts/probe_mosaic.py,
scripts/stream_ablate.py):

* Triangles live in HBM as per-super-chunk *tiles* of 1024 triangles in
  BVH-leaf (DFS) order, stored **component-major** (components on
  sublanes, triangles on lanes) so the tile is dense and 128-lane
  aligned.  One tile is a single 96 KB DMA, double-buffered; **no VMEM
  residency cap**.
* Per ray block (BLK rays) the *candidate super-chunk list* is computed
  OUTSIDE the kernel with flat vectorised slab tests (no gathers) and
  sorted front-to-back by block-min entry t.  Lists ride in SMEM.
* The kernel walks candidates with an **early-exit while loop**: it
  maintains the block's worst live ray distance (max best-t for closest
  hit; max tmax over unoccluded lanes for occlusion) in SMEM and stops
  the moment the next candidate's entry t is beyond it — with a
  front-to-back list most of the tail is never touched (and never
  DMA'd).  Tile k+1 is prefetched while k is processed; a prefetch that
  the shrinking exit bound later invalidates is drained after the loop
  so semaphores stay balanced.
* Möller-Trumbore runs on the **MXU as feature dot products**: all four
  MT scalars are ray-feature · triangle-feature contractions
      det   = -(d·n)                        n  = e1 x e2
      u_num =  (o x d)·e2 + d·(v0 x e2)
      v_num = -(o x d)·e1 + d·(e1 x v0)
      t_num =  o·n - v0·n
  so a 128-triangle group costs three (BLK,8)x(8,128) matmuls plus a
  short elementwise epilogue, instead of ~60 VPU ops per (ray,tri) pair
  (measured 2.7x on the full kernel).  Triangle features are
  precomputed on the host into the tile rows (layout below).  Features
  are **recentred** (v0 - scene/mesh centre, matching recentred ray
  origins) so the o x d term stays small: the feature form loses
  ~|o|*eps of precision otherwise.
* All in-kernel math runs rays-on-sublanes x entities-on-lanes: chunk
  culling is one (BLK, 64) slab test; groups are skipped via scalar
  compaction into an SMEM list.

Data layouts:
  raysT  : (R, 8)  [ox oy oz tmin dx dy dz tmax] rows=rays, R % BLK == 0
           (origins recentred by the caller for non-instanced scenes)
  sbox   : (S, 8)  super-chunk bboxes [lo.xyz, hi.xyz, pad2] (recentred)
  tiles  : (S, 24, 1024) per-super-chunk tile, lanes = triangle slot,
           rows in three 8-row matmul blocks (junk rows in a block are
           cancelled by structural zeros in the ray-feature LHS):
              0..2   n = e1 x e2
              3      v0·n
              4      triangle id (as f32)
              5      mask-texture id (as f32; -1 = opaque)
              6..7   chunk-bbox lo.x / lo.y   (lanes 0..63)
              8..10  v0 x e2
              11..13 e2
              14..15 chunk-bbox lo.z / hi.x   (lanes 0..63)
              16..18 e1 x v0
              19..21 -e1
              22..23 chunk-bbox hi.y / hi.z   (lanes 0..63)
           (chunk c = triangle lanes 16c..16c+15)
  out    : (R, 8)  [t u v id 0...] rows=rays
"""

from __future__ import annotations

import os as _os

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

# Chunk-bbox component -> (tile row, see layout above).
_CBOX_ROWS = (6, 7, 14, 15, 22, 23)


# --------------------------------------------------------------------------
# Host-side tile packing
# --------------------------------------------------------------------------

def pack_stream_tiles(tri_v0, tri_e1, tri_e2, tri_id, tri_mask=None):
    """(sbox (S,8), tiles (S,24,1024), center (3,)) from packed-leaf-order
    triangles.

    Triangles arrive in BVH DFS order (spatially coherent); padding slots
    have id -1 and zero edges (=> zero features, det 0, never hit).
    Geometry is recentred around the scene bbox centre; callers must
    subtract `center` from ray origins (render/traverse.py does).
    `tri_mask`: optional (P,) i32 mask-texture id per packed triangle."""
    from ..accel.flatten import pack_chunks

    valid = tri_id >= 0
    if valid.any():
        va = tri_v0[valid]
        vb = va + tri_e1[valid]
        vc = va + tri_e2[valid]
        lo = np.minimum(np.minimum(va.min(0), vb.min(0)), vc.min(0))
        hi = np.maximum(np.maximum(va.max(0), vb.max(0)), vc.max(0))
        center = ((lo + hi) * 0.5).astype(np.float32)
    else:
        center = np.zeros(3, np.float32)

    sbox, cbox, tris12 = pack_chunks(tri_v0 - center, tri_e1, tri_e2, tri_id)
    num_s = sbox.shape[0]
    t = tris12.reshape(num_s, TRI_ROWS, 12)
    v0 = t[:, :, 0:3]
    e1 = t[:, :, 3:6]
    e2 = t[:, :, 6:9]
    tid = t[:, :, 9]
    # Padding slots carry v0 = 1e30 (pack_chunks) with zero edges; zero
    # the position so v0·n-style features stay finite-by-construction.
    pad = tid < 0.0
    v0 = np.where(pad[:, :, None], 0.0, v0)

    n = np.cross(e1, e2)
    tiles = np.zeros((num_s, TILE_ROWS, TRI_ROWS), np.float32)
    for c in range(3):
        tiles[:, 0 + c, :] = n[:, :, c]
    tiles[:, 3, :] = (v0 * n).sum(-1)
    tiles[:, 4, :] = tid
    if tri_mask is not None:
        m = np.full(TRI_ROWS * num_s, -1.0, np.float32)
        m[: tri_mask.shape[0]] = tri_mask.astype(np.float32)
        tiles[:, 5, :] = m.reshape(num_s, TRI_ROWS)
    else:
        tiles[:, 5, :] = -1.0
    v0xe2 = np.cross(v0, e2)
    e1xv0 = np.cross(e1, v0)
    for c in range(3):
        tiles[:, 8 + c, :] = v0xe2[:, :, c]
        tiles[:, 11 + c, :] = e2[:, :, c]
        tiles[:, 16 + c, :] = e1xv0[:, :, c]
        tiles[:, 19 + c, :] = -e1[:, :, c]

    cb = cbox.reshape(num_s, SUPER, 8)
    for c in range(6):
        tiles[:, _CBOX_ROWS[c], :SUPER] = cb[:, :, c]
    # Empty-chunk padding boxes are (+BIG, -BIG) from pack_chunks; lanes
    # SUPER.. of the bbox rows are zero and never read (slices stop at 64).
    return sbox, tiles, center


# --------------------------------------------------------------------------
# XLA-side candidate lists (per ray block)
# --------------------------------------------------------------------------

def _safe_inv(x):
    s = jnp.where(x >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(x), 1e-12)


def superchunk_candidates(rays8t, sbox):
    """Per-block candidate super-chunks, sorted front-to-back.

    Returns (slist (B,1,S) i32, skey (B,1,S) f32, scount (B,1,1) i32):
    slist[b,0,:scount[b]] are the super-chunks any ray of block b can
    hit, ordered by the block-min entry t; skey carries those entry ts
    (BIG past the count) for the kernel's early-exit bound.  Vectorised
    slab tests in groups of 8 super-chunks (bounds the (G, R)
    intermediates; no data-dependent shapes)."""
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
    masked = jnp.where(hit, key, BIG)
    idx = jnp.broadcast_to(
        jnp.arange(num_s, dtype=jnp.int32)[None, :], masked.shape
    )
    skey, order = jax.lax.sort((masked, idx), num_keys=1)
    count = jnp.sum(hit, axis=1).astype(jnp.int32)
    return order[:, None, :], skey[:, None, :], count[:, None, None]


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
    """(BLK, 64) chunk slab test from the tile's chunk-bbox rows."""
    lox = tile[slot, 6:7, 0:SUPER]
    loy = tile[slot, 7:8, 0:SUPER]
    loz = tile[slot, 14:15, 0:SUPER]
    hix = tile[slot, 15:16, 0:SUPER]
    hiy = tile[slot, 22:23, 0:SUPER]
    hiz = tile[slot, 23:24, 0:SUPER]
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


def _mt_group(tile, slot, g, rc, tmin, t_limit):
    """Möller-Trumbore of triangle group g from the precomputed feature
    rows — ~25 VPU ops per (ray, triangle) pair vs ~60 for the classic
    cross-product form.

    rc = (ox, oy, oz, dx, dy, dz, cx, cy, cz) ray columns, c = o x d.
    Returns (t, u, v, tid, ok), each (BLK, GROUP).

    NB an MXU formulation ((BLK,8) x (8,GROUP) dots over the same feature
    rows) was measured SLOWER end-to-end (125 ms vs 80 ms per 262k-ray
    dispatch on the 24k-tri scene): at K=8 the dot is operand-staging
    bound and f32 needs HIGHEST (multi-pass) to keep hits bit-exact.
    The feature rows keep that door open; the VPU epilogue is the win
    today."""
    ox, oy, oz, dx, dy, dz, cx, cy, cz = rc
    # Alignment hint: without it Mosaic must assume an arbitrary lane
    # offset and emits a dynamic lane-rotate per read.
    lo = pl.multiple_of(g * GROUP, GROUP)
    row = lambda r: tile[slot, r : r + 1, pl.ds(lo, GROUP)]
    nx, ny, nz = row(0), row(1), row(2)
    v0n = row(3)
    tid = row(4)
    ax, ay, az = row(8), row(9), row(10)        # v0 x e2
    e2x, e2y, e2z = row(11), row(12), row(13)
    bx, by, bz = row(16), row(17), row(18)      # e1 x v0
    m1x, m1y, m1z = row(19), row(20), row(21)   # -e1

    det = -(dx * nx + dy * ny + dz * nz)
    u_num = (cx * e2x + cy * e2y + cz * e2z
             + dx * ax + dy * ay + dz * az)
    v_num = (cx * m1x + cy * m1y + cz * m1z
             + dx * bx + dy * by + dz * bz)
    t_num = ox * nx + oy * ny + oz * nz - v0n
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    t = t_num * inv_det
    u = u_num * inv_det
    v = v_num * inv_det
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
    unnormalised form needs no rescale and keeps best-t shared).

    Epilogue (round 3): the best hit is tracked per LANE COLUMN
    (cols_ref, (BLK, GROUP) running minima updated with pure elementwise
    selects) and reduced across lanes once per CANDIDATE — the previous
    per-group epilogue paid five cross-lane reductions per 128-triangle
    group (min + eq-select + three masked-max picks), which dominated
    the MT cost (58 of 80 ms/dispatch measured at 24k tris).  Ties
    between triangles with bit-equal t now resolve by (lane, then u/v/id
    max) instead of (group, then u/v/id max) — both arbitrary, both
    deterministic."""

    def kernel(*refs):
        if instanced:
            (rays_ref, sbox_ref, slist_ref, skey_ref, scount_ref, tidx_ref,
             iinst_ref, itab_ref, tiles_ref, out_ref, acc_ref, tile_ref,
             gflag_ref, glist_ref, gcnt_ref, stop_ref, pend_ref,
             sem_ref, cols_ref) = refs
        else:
            (rays_ref, sbox_ref, slist_ref, skey_ref, scount_ref, tiles_ref,
             out_ref, acc_ref, tile_ref, gflag_ref, glist_ref, gcnt_ref,
             stop_ref, pend_ref, sem_ref, cols_ref) = refs

        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
        zeros = jnp.zeros_like(ox)
        if occl:
            acc_ref[:, 0:1] = zeros
            cols_ref[0, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
            # Early-exit bound: the farthest tmax any unoccluded lane
            # still needs (inactive lanes carry tmax < 0).
            stop_ref[0] = jnp.max(tmax)
        else:
            acc_ref[:, 0:1] = tmax
            cols_ref[0, :, :] = jnp.full((BLK, GROUP), BIG, jnp.float32)
            cols_ref[1, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
            cols_ref[2, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
            cols_ref[3, :, :] = jnp.full((BLK, GROUP), -1.0, jnp.float32)
            stop_ref[0] = jnp.max(tmax)
        pend_ref[0] = -1

        n = scount_ref[0, 0, 0]

        if not instanced:
            rc0 = (ox, oy, oz, dx, dy, dz,
                   oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx)

        def tile_dma(k, slot):
            sc = slist_ref[0, 0, k]
            ti = tidx_ref[0, 0, sc] if instanced else sc
            return pltpu.make_async_copy(
                tiles_ref.at[ti], tile_ref.at[slot], sem_ref.at[slot]
            )

        @pl.when(n > 0)
        def _():
            tile_dma(0, 0).start()
            pend_ref[0] = 0

        def body(carry):
            k, _ = carry
            slot = jax.lax.rem(k, 2)

            tile_dma(k, slot).wait()
            pend_ref[0] = -1

            # Conservative prefetch against the *current* bound; the
            # bound only shrinks, so a candidate it rejects stays
            # rejected (no missed prefetch), and one it admits that the
            # post-update bound later rejects is drained after the loop.
            @pl.when((k + 1 < n) & (skey_ref[0, 0, k + 1] < stop_ref[0]))
            def _():
                tile_dma(k + 1, 1 - slot).start()
                pend_ref[0] = 1 - slot

            # Re-check the super-chunk against the current best t /
            # termination state (the candidate list was built with the
            # initial tmax).
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
                    rc = (cox, coy, coz, cdx, cdy, cdz,
                          coy * cdz - coz * cdy, coz * cdx - cox * cdz,
                          cox * cdy - coy * cdx)
                else:
                    cox, coy, coz = ox, oy, oz
                    cix, ciy, ciz = ix, iy, iz
                    rc = rc0
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
                        tile_ref, slot, g, rc, tmin, limit
                    )
                    # Pure elementwise per-column best updates — no
                    # cross-lane reductions inside the group loop (see
                    # the factory docstring).
                    if occl:
                        cols_ref[0, :, :] = jnp.maximum(
                            cols_ref[0, :, :], jnp.where(ok, 1.0, 0.0))
                        return 0
                    if id_off is not None:
                        tid = tid + id_off
                    t = jnp.where(ok, t, BIG)
                    bt = cols_ref[0, :, :]
                    closer = t < bt
                    cols_ref[0, :, :] = jnp.where(closer, t, bt)
                    cols_ref[1, :, :] = jnp.where(closer, u,
                                                  cols_ref[1, :, :])
                    cols_ref[2, :, :] = jnp.where(closer, v,
                                                  cols_ref[2, :, :])
                    cols_ref[3, :, :] = jnp.where(
                        closer, tid * jnp.ones_like(u), cols_ref[3, :, :])
                    return 0

                jax.lax.fori_loop(0, gcnt_ref[0], mt_body, 0)

                # ONE cross-lane reduction per candidate: refresh the
                # per-ray best (culling + exit bound).
                if occl:
                    acc_ref[:, 0:1] = jnp.max(cols_ref[0, :, :], axis=1,
                                              keepdims=True)
                    need = jnp.where(acc_ref[:, 0:1] > 0.0, -BIG, tmax)
                    stop_ref[0] = jnp.max(need)
                else:
                    acc_ref[:, 0:1] = jnp.minimum(
                        acc_ref[:, 0:1],
                        jnp.min(cols_ref[0, :, :], axis=1, keepdims=True))
                    stop_ref[0] = jnp.max(acc_ref[:, 0:1])

            nk = k + 1
            go = (nk < n) & (skey_ref[0, 0, nk] < stop_ref[0])
            return nk, go

        jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))

        # Drain a prefetch the exit bound invalidated.
        @pl.when(pend_ref[0] >= 0)
        def _():
            pltpu.make_async_copy(
                tiles_ref.at[0], tile_ref.at[pend_ref[0]],
                sem_ref.at[pend_ref[0]]
            ).wait()

        if occl:
            out_ref[:, 0:1] = acc_ref[:, 0:1]
            out_ref[:, 1:8] = jnp.concatenate([zeros] * 7, axis=1)
        else:
            # Final cross-lane resolve, once per block: winner lane =
            # first column holding the best t; u/v/id picked from it.
            bt = cols_ref[0, :, :]
            t_fin = acc_ref[:, 0:1]
            sel = (bt == t_fin) & (bt < BIG)
            pick = lambda a: jnp.max(jnp.where(sel, a, -BIG), axis=1,
                                     keepdims=True)
            got = jnp.max(jnp.where(sel, 1.0, 0.0), axis=1,
                          keepdims=True) > 0.0
            out_ref[:, 0:1] = t_fin
            out_ref[:, 1:2] = jnp.where(got, pick(cols_ref[1, :, :]), 0.0)
            out_ref[:, 2:3] = jnp.where(got, pick(cols_ref[2, :, :]), 0.0)
            out_ref[:, 3:4] = jnp.where(got, pick(cols_ref[3, :, :]), -1.0)
            out_ref[:, 4:8] = jnp.concatenate([zeros] * 4, axis=1)

    return kernel


def _stream_call(raysT, sbox, slist, skey, scount, tiles, occl=False,
                 inst=None):
    num_r = raysT.shape[0]
    num_s = sbox.shape[0]
    instanced = inst is not None
    in_specs = [
        pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_s, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, slist.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, skey.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [raysT, sbox, slist, skey, scount]
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
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            # Per-lane-column running best (t/u/v/id; 1 flag plane for
            # occlusion) — the reduction-free group epilogue.
            pltpu.VMEM((1 if occl else 4, BLK, GROUP), jnp.float32),
        ],
    )(*args)


# --------------------------------------------------------------------------
# Ray stream sorting (bounce/shadow coherence)
# --------------------------------------------------------------------------

def _part1by2(x):
    """Spread 8 bits of x to every third bit (Morton interleave helper)."""
    x = x & 0xFF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def sort_keys(org, d, active, lo, hi):
    """Spatial sort key per ray: Morton code of the quantised origin
    (8 bits/axis, major) + direction octant (minor); inactive lanes get
    the max key so they compact into trailing all-dead blocks whose
    candidate count is zero (the kernel skips them in one SMEM read).

    The reference's RayQueue::compact + material sort play this role for
    its wavefront scheduling (ray_queue.h:145-221); here sorting buys
    per-block candidate-list coherence instead.

    Default key (round-4): direction-octant MAJOR, Morton minor.  A
    scattered bounce batch sorted position-major packs mixed-direction
    rays into each block, and the kernel's front-to-back early-exit
    bound goes dead (the candidate list is ordered by block-min entry t,
    which is direction-dependent — with 8 octants in a block no single
    ordering is front-to-back for anyone).  Octant-major blocks share a
    traversal direction, so the sorted candidate walk terminates like a
    primary-ray block's.  Same sort cost, exact under any permutation.
    Measured (r4_chain25.log): scattered 262k rays 2.35 vs 1.52 Mrays/s
    @24k tris, 0.71 vs 0.60 @264k; end-to-end 48k-tri PT frame
    2306 vs 2614 ms (−12%).  IMBA_SORT_KEY=morton restores the old
    position-major key; "chunk" is the measured-neutral experiment."""
    span = jnp.maximum(hi - lo, 1e-6)
    q = jnp.clip(((org - lo) / span) * 256.0, 0.0, 255.0).astype(jnp.int32)
    m = (
        (_part1by2(q[:, 0]) << 2)
        | (_part1by2(q[:, 1]) << 1)
        | _part1by2(q[:, 2])
    )
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        + 2 * (d[:, 1] < 0).astype(jnp.int32)
        + 4 * (d[:, 2] < 0).astype(jnp.int32)
    )
    if _os.environ.get("IMBA_SORT_KEY", "octant") in ("morton", "chunk"):
        key = (m << 3) | octant
    else:
        key = (octant << 24) | m
    return jnp.where(active, key, jnp.int32(2**30))


def _scene_bounds(sbox):
    lo = jnp.min(sbox[:, 0:3], axis=0)
    hi = jnp.max(sbox[:, 3:6], axis=0)
    return lo, hi


def first_chunk(org, d, tmin, tmax, active, sbox):
    """Per-ray NEAREST candidate super-chunk id (argmin entry t over the
    slab hits; inactive / no-candidate rays get num_s so they compact
    into trailing blocks).  Same group-of-8 slab structure as
    superchunk_candidates, reduced per ray instead of per block."""
    num_s = sbox.shape[0]
    num_r = org.shape[0]
    o = org.T[None]                            # (1, 3, R)
    inv = _safe_inv(d.T)[None]                 # (1, 3, R)
    tmn = tmin[None]                           # (1, R)
    tmx = tmax[None]
    best_t = jnp.full((num_r,), BIG, jnp.float32)
    best_c = jnp.full((num_r,), num_s, jnp.int32)
    G = 8
    for g in range(0, num_s, G):
        gs = min(G, num_s - g)
        lo = sbox[g : g + gs, 0:3][:, :, None]     # (gs, 3, 1)
        hi = sbox[g : g + gs, 3:6][:, :, None]
        t0 = (lo - o) * inv                        # (gs, 3, R)
        t1 = (hi - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=1)  # (gs, R)
        tf = jnp.min(jnp.maximum(t0, t1), axis=1)
        m = (tn <= tf) & (tf >= tmn) & (tn <= tmx)
        key = jnp.where(m, jnp.maximum(tn, 0.0), BIG)
        gmin = jnp.min(key, axis=0)                # (R,)
        garg = jnp.argmin(key, axis=0).astype(jnp.int32) + g
        take = gmin < best_t
        best_t = jnp.where(take, gmin, best_t)
        best_c = jnp.where(take, garg, best_c)
    return jnp.where(active, best_c, jnp.int32(num_s))


def _sorted_dispatch(fn, sbox, tiles, org, d, tmin, tmax, active, inst):
    """Sort rays by sort_keys, dispatch fn on the sorted stream, unsort.

    IMBA_SORT_KEY (read at trace time) picks the key: "morton" = origin
    Morton + direction octant (round-2 default).  "chunk" = per-ray
    nearest candidate super-chunk id major, morton minor: block-mates
    then share their FIRST (and usually decisive, front-to-back)
    candidate, so divergent batches stop paying for block-mates'
    disjoint walks.  Any permutation is exact -- purely a coherence
    knob.  Measured NEUTRAL (r4_chain17.log): scattered 262k rays
    1.51 vs 1.52 Mrays/s @24k tris, 0.61 vs 0.60 @264k; end-to-end
    48k-tri PT frame 2579 vs 2605 ms (~1%, inside session noise) --
    the block walk is bounded by the UNION of block candidates, and
    morton blocks already mostly share the first chunk.  morton stays
    the default; "chunk" is kept as an opt-in coherence experiment."""
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    act = jnp.ones((num_r,), jnp.bool_) if active is None else active
    lo, hi = _scene_bounds(sbox)
    key = sort_keys(org, d, act, lo, hi)
    iota = jnp.arange(num_r, dtype=jnp.int32)
    if _os.environ.get("IMBA_SORT_KEY", "morton") == "chunk" and inst is None:
        ckey = first_chunk(org, d, tmin, tmax, act, sbox)
        _, _, perm = jax.lax.sort((ckey, key, iota), num_keys=2)
    else:
        _, perm = jax.lax.sort((key, iota), num_keys=1)
    res = fn(sbox, tiles, org[perm], d[perm], tmin[perm], tmax[perm],
             active=act[perm], inst=inst)
    _, inv = jax.lax.sort((perm, iota), num_keys=1)
    if isinstance(res, tuple) or hasattr(res, "t"):
        from ..render.traverse import Hit

        return Hit(t=res.t[inv], prim_id=res.prim_id[inv], u=res.u[inv],
                   v=res.v[inv])
    return res[inv]


def closest_hit_sorted(sbox, tiles, org, d, tmin, tmax, active=None,
                       inst=None):
    return _sorted_dispatch(closest_hit_stream, sbox, tiles, org, d,
                            tmin, tmax, active, inst)


def any_hit_sorted(sbox, tiles, org, d, tmin, tmax, active=None, inst=None):
    return _sorted_dispatch(any_hit_stream, sbox, tiles, org, d,
                            tmin, tmax, active, inst)


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
    slist, skey, scount = superchunk_candidates(rays8t, sbox)
    out = _stream_call(rays8t.T, sbox, slist, skey, scount, tiles,
                       inst=inst)[:num_r]
    t = out[:, 0]
    prim_id = out[:, 3].astype(jnp.int32)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=out[:, 1], v=out[:, 2])


def any_hit_stream(sbox, tiles, org, d, tmin, tmax, active=None, inst=None):
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    slist, skey, scount = superchunk_candidates(rays8t, sbox)
    out = _stream_call(rays8t.T, sbox, slist, skey, scount, tiles, occl=True,
                       inst=inst)[:num_r]
    return out[:, 0] > 0.0
