"""Pair-stream traversal: (ray x super-chunk) pairs, zero block divergence.

The block-synchronous streaming kernel (ops/pallas_stream.py) walks a
*per-block* candidate list: all 512 rays of a block test every candidate
any of them needs, so incoherent batches waste ~10-100x of the MT work on
rays that never wanted the tile (measured: scattered rays 0.6 Mrays/s vs
11.8 tiled-primary on the same scene).  This module restructures the work
stream instead of the rays: each (ray, super-chunk) PAIR becomes one
kernel lane, pairs are sorted by super-chunk, and a block intersects only
the tiles its own lanes want — the reference external kernels' role
(render/scheduling/ray_queue.h:254-341) realised as a sorted work queue.

Round-3 queue design — SORT-ONLY, after the round-2 build (scatter
placement + segment_sum counts + 4 segment reductions) measured more
expensive than the kernel it fed (scatters/segment ops lower
near-serially on this TPU; 1.3-1.6 Mrays/s end-to-end):

* Every ray contributes EXACTLY K_MAX pair lanes (invalid candidates
  ride along with sentinel keys).  P = R * K_MAX, statically shaped,
  nothing is compacted and nothing is padded.
* Queue build = ONE `lax.sort` keyed by super-chunk, carrying the ray's
  8 components + pair metadata as payload columns (the 8-wide row is a
  BROADCAST pre-sort, so no gather anywhere).
* Blocks are NOT aligned to super-chunk runs.  A block knows its lanes'
  [first, last] super-chunk (two boundary reads per block — sorted
  order makes the span contiguous) and the kernel walks that span,
  masking lanes by a data compare `lane_sc == ti` — the same
  sort-merge-join shape as ops/pallas_merge.py, because Mosaic cannot
  index by lane but compares for free.
* Per-ray resolution = ONE more `lax.sort` keyed (ray, t): each ray
  owns exactly K_MAX consecutive rows of the result, so the winner is
  `reshape(R, K)[:, 0]` — no segment ops, no scatters, no gathers.

Early termination across candidates is traded away on this path (every
pair is intersected); the front-to-back top-K cap bounds the loss at
K_MAX tiles per ray.  Rays with more than K_MAX true candidates are
only correct within the K nearest — callers needing exactness on such
rays use the block-stream kernel (traverse.py routes; ray_candidates
returns the true count so tests can assert non-saturation).

Data layouts shared with pallas_stream: sbox (S, 8), tiles (S, 24, 1024)
feature tiles, rays8t (8, R) component-major."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stream import (
    BIG,
    BLK,
    GROUP,
    NGROUP,
    TILE_ROWS,
    TRI_ROWS,
    _chunk_slab,
    _compact_groups,
    _mt_group,
    _ray_cols,
    _rays8t,
)

import os as _os

K_MAX = 8
RAY_CHUNK = 1 << 15      # per-ray candidate pass ray-chunking (VMEM bound)
# Candidate selection (round-4 rework, VERDICT r3 item 3):
#   "front" — front-to-back top-K via k iterative argmin reductions
#             (~4x cheaper than lax.top_k's per-row sort, CLAUDE.md).
#             mindrop becomes the (k+1)-th NEAREST entry — the largest
#             possible — so the saturation fallback only fires for rays
#             whose true hit lies beyond their K nearest chunks (rare),
#             instead of the round-3 66% (first-k-by-index made mindrop
#             an arbitrary dropped entry, forcing most saturated rays
#             through the stream fallback: pay both pipelines, lose
#             end-to-end).
#   "first" — round-3 first-k-by-index (rank arithmetic, no per-ray
#             entry ordering); cheapest build, biggest fallback.
#   "topk"  — lax.top_k (measured 29 vs 7.6 ms at 264k tris; kept for
#             A/B only).
SEL = _os.environ.get("IMBA_PAIRS_SEL", "front")
PASSES = 1               # closest-hit schedule: 1 = all candidates in one
                         # queue; 2 = nearest candidate first, remainder
                         # clamped to its best t (early termination)


# --------------------------------------------------------------------------
# XLA side: per-ray candidates and the sorted pair queue
# --------------------------------------------------------------------------

def _safe_inv(x):
    s = jnp.where(x >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(x), 1e-12)


def ray_candidates(rays8t, sbox, k_max=K_MAX, with_ents=False):
    """Top-k super-chunk candidates per RAY, front-to-back,
    k = min(k_max, num_superchunks) (small scenes get narrow queues).

    Returns (idx (R, k) i32 — -1 past the ray's count, ent (R, k) f32
    entry t (BIG where invalid), count (R,) i32 total intersected — may
    exceed k; callers compare against k to detect saturation, and
    mindrop (R,) f32 — the smallest entry t among candidates NOT kept
    (BIG when none dropped): a closest hit at t <= mindrop is provably
    exact even for a saturated ray."""
    num_s = sbox.shape[0]
    num_r = rays8t.shape[1]
    outs_i, outs_e, outs_c, outs_m = [], [], [], []
    for r0 in range(0, num_r, RAY_CHUNK):
        r1 = min(r0 + RAY_CHUNK, num_r)
        o = rays8t[0:3, r0:r1]                 # (3, Rc)
        inv = _safe_inv(rays8t[4:7, r0:r1])
        tmin = rays8t[3, r0:r1]
        tmax = rays8t[7, r0:r1]
        ent_cols = []
        G = 64
        for g in range(0, num_s, G):
            lo = sbox[g : g + G, 0:3]          # (Gc, 3)
            hi = sbox[g : g + G, 3:6]
            t0 = (lo[:, :, None] - o[None]) * inv[None]      # (Gc, 3, Rc)
            t1 = (hi[:, :, None] - o[None]) * inv[None]
            tn = jnp.max(jnp.minimum(t0, t1), axis=1)        # (Gc, Rc)
            tf = jnp.min(jnp.maximum(t0, t1), axis=1)
            m = (tn <= tf) & (tf >= tmin[None]) & (tn <= tmax[None])
            ent_cols.append(jnp.where(m, jnp.maximum(tn, 0.0), BIG))
        ent_all = jnp.concatenate(ent_cols, axis=0).T        # (Rc, S)
        hit = ent_all < BIG
        count = jnp.sum(hit, axis=1).astype(jnp.int32)
        k = min(k_max, num_s)
        if SEL == "front":
            # Front-to-back top-K: k rounds of (argmin, min, mask-out).
            # Three (Rc, S) passes per round — elementwise + reduction
            # only, no per-row sort, no gathers.
            s_iota = jnp.arange(ent_all.shape[1], dtype=jnp.int32)[None, :]
            ent_work = ent_all
            idx_cols, ent_cols_v = [], []
            for j in range(k):
                e = jnp.min(ent_work, axis=1)
                col = jnp.argmin(ent_work, axis=1).astype(jnp.int32)
                valid = e < BIG
                idx_cols.append(jnp.where(valid, col, -1))
                ent_cols_v.append(jnp.where(valid, jnp.maximum(e, 0.0),
                                            BIG))
                ent_work = jnp.where(
                    (s_iota == col[:, None]) & valid[:, None], BIG,
                    ent_work)
            idx = jnp.stack(idx_cols, axis=1)
            ent = jnp.stack(ent_cols_v, axis=1)
            # Everything still in ent_work was dropped; its minimum is
            # the (k+1)-th nearest entry — the exactness horizon.
            mindrop = jnp.min(ent_work, axis=1)
        elif SEL == "first":
            # First-k-by-index via rank arithmetic: the 1-pass queue
            # never uses candidate ORDER (no early exit across pairs;
            # saturated rays re-trace through the exact fallback), so
            # the front-to-back top_k — whose TPU lowering is a
            # per-row sort — is pure overhead (measured 29 vs 7.6 ms at
            # 264k tris).  k argmax reductions replace it.
            rank = jnp.cumsum(hit.astype(jnp.int32), axis=1)
            idx_cols = []
            for j in range(k):
                sel = hit & (rank == j + 1)
                col = jnp.argmax(sel, axis=1).astype(jnp.int32)
                idx_cols.append(jnp.where(count > j, col, -1))
            idx = jnp.stack(idx_cols, axis=1)
            if with_ents:
                # Real entry ts (one masked max reduction per column) —
                # the 2-pass schedule filters pass-2 candidates on them.
                ent_cols_v = []
                for j in range(k):
                    sel = hit & (rank == j + 1)
                    ent_cols_v.append(jnp.where(
                        count > j,
                        jnp.max(jnp.where(sel, ent_all, -BIG), axis=1),
                        BIG))
                ent = jnp.stack(ent_cols_v, axis=1)
            else:
                # Entry ts are unused by the 1-pass queue; keep the
                # return shape without paying the extra reductions.
                ent = jnp.where(idx >= 0, 0.0, BIG)
            mindrop = jnp.min(
                jnp.where(hit & (rank > k), ent_all, BIG), axis=1)
        else:
            neg, idx = jax.lax.top_k(-ent_all, k)
            ent = -neg
            idx = jnp.where(ent < BIG, idx.astype(jnp.int32), -1)
            rank = jnp.cumsum(hit.astype(jnp.int32), axis=1)
            kth = jnp.max(jnp.where(ent < BIG, ent, -BIG), axis=1)
            mindrop = jnp.where(count > k, jnp.maximum(kth, 0.0), BIG)
        outs_i.append(idx)
        outs_e.append(ent)
        outs_c.append(count)
        outs_m.append(mindrop)
    return (jnp.concatenate(outs_i), jnp.concatenate(outs_e),
            jnp.concatenate(outs_c), jnp.concatenate(outs_m))


def build_queue(idx, rays8, num_s):
    """ONE sort: pairs keyed by super-chunk, ray rows as payload.

    idx: (R, K) candidate super-chunks (-1 invalid); rays8: (R, 8).
    Returns (rows (P, 8) pair ray rows — inactive lanes tmax < 0,
    sc_col (P, 1) f32 lane super-chunk (-1 invalid), pair_ray (P,) i32,
    bounds (B, 1, 2) i32 per-block [first, last] super-chunk span)."""
    num_r, k = idx.shape
    num_p = num_r * k
    sentinel = jnp.int32(num_s)
    sc = jnp.where(idx >= 0, idx, sentinel).reshape(-1)
    ray = jnp.broadcast_to(
        jnp.arange(num_r, dtype=jnp.int32)[:, None], idx.shape).reshape(-1)
    cols = [jnp.broadcast_to(rays8[:, c : c + 1], idx.shape).reshape(-1)
            for c in range(8)]
    out = jax.lax.sort((sc, ray, *cols), num_keys=1)
    sc_s, ray_s = out[0], out[1]
    valid = sc_s < sentinel
    rows = jnp.stack(out[2:], axis=1)                       # (P, 8)
    rows = rows.at[:, 7].set(jnp.where(valid, rows[:, 7], -1.0))
    sc_col = jnp.where(valid, sc_s, -1).astype(jnp.float32)[:, None]

    nblocks = num_p // BLK
    first = sc_s[0 :: BLK][:nblocks]
    last = sc_s[BLK - 1 :: BLK][:nblocks]
    lo = jnp.minimum(first, sentinel)
    hi = jnp.minimum(last, sentinel - 1)                    # skip sentinels
    bounds = jnp.stack([lo, hi], axis=1).reshape(nblocks, 1, 2)
    return rows, sc_col, ray_s, bounds


# --------------------------------------------------------------------------
# Kernel: walk the block's super-chunk span, lanes masked by key compare
# --------------------------------------------------------------------------

def _make_span_kernel(occl: bool, instanced: bool):
    def kernel(*refs):
        if instanced:
            (rays_ref, scc_ref, bounds_ref, tidx_ref, iinst_ref, itab_ref,
             tiles_ref, out_ref, acc_ref, tile_ref, gflag_ref, glist_ref,
             gcnt_ref, last_ref, sem_ref, cols_ref) = refs
        else:
            (rays_ref, scc_ref, bounds_ref, tiles_ref, out_ref, acc_ref,
             tile_ref, gflag_ref, glist_ref, gcnt_ref, last_ref, sem_ref,
             cols_ref) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            last_ref[0] = -1          # tile scratch uninitialised at start

        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
        lane_sc = scc_ref[:, 0:1]
        zeros = jnp.zeros_like(ox)
        if occl:
            acc_ref[:, 0:1] = zeros
            cols_ref[0, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
        else:
            acc_ref[:, 0:1] = tmax
            cols_ref[0, :, :] = jnp.full((BLK, GROUP), BIG, jnp.float32)
            cols_ref[1, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
            cols_ref[2, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
            cols_ref[3, :, :] = jnp.full((BLK, GROUP), -1.0, jnp.float32)

        lo = bounds_ref[0, 0, 0]
        hi = bounds_ref[0, 0, 1]

        def span_body(ti, _):
            lane_ok = lane_sc == ti.astype(jnp.float32)

            @pl.when(jnp.any(lane_ok))
            def _():
                tj = tidx_ref[0, 0, ti] if instanced else ti

                # Consecutive blocks (and span steps) often reuse a
                # tile; the scratch persists across grid steps.
                @pl.when(tj != last_ref[0])
                def _():
                    cp = pltpu.make_async_copy(
                        tiles_ref.at[tj], tile_ref.at[0], sem_ref.at[0]
                    )
                    cp.start()
                    cp.wait()
                    last_ref[0] = tj

                if instanced:
                    ii = iinst_ref[0, 0, ti]
                    row = itab_ref[pl.ds(ii, 1), :]
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
                rc = (cox, coy, coz, cdx, cdy, cdz,
                      coy * cdz - coz * cdy, coz * cdx - cox * cdz,
                      cox * cdy - coy * cdx)

                tn, tf = _chunk_slab(tile_ref, 0, cox, coy, coz,
                                     cix, ciy, ciz)
                limit0 = tmax if occl else acc_ref[:, 0:1]
                cm = (tn <= tf) & (tf >= tmin) & (tn <= limit0) & lane_ok
                _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

                def mt_body(j, _):
                    g = glist_ref[j]
                    limit = tmax if occl else acc_ref[:, 0:1]
                    t, u, v, tid, ok = _mt_group(tile_ref, 0, g, rc, tmin,
                                                 limit)
                    ok = ok & lane_ok
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

                if not occl:
                    acc_ref[:, 0:1] = jnp.minimum(
                        acc_ref[:, 0:1],
                        jnp.min(cols_ref[0, :, :], axis=1, keepdims=True))

            return 0

        jax.lax.fori_loop(lo, hi + 1, span_body, 0)

        if occl:
            out_ref[:, 0:1] = jnp.max(cols_ref[0, :, :], axis=1,
                                      keepdims=True)
            out_ref[:, 1:8] = jnp.concatenate([zeros] * 7, axis=1)
        else:
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


def _pairs_call(rows, sc_col, bounds, tiles, occl=False, inst=None):
    num_p = rows.shape[0]
    nblocks = num_p // BLK
    instanced = inst is not None
    in_specs = [
        pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [rows, sc_col, bounds]
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
        _make_span_kernel(occl, instanced),
        out_shape=jax.ShapeDtypeStruct((num_p, 8), jnp.float32),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, 1), jnp.float32),
            pltpu.VMEM((1, TILE_ROWS, TRI_ROWS), jnp.float32),
            pltpu.VMEM((NGROUP, 1), jnp.int32),
            pltpu.SMEM((NGROUP,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.VMEM((1 if occl else 4, BLK, GROUP), jnp.float32),
        ],
    )(*args)


# --------------------------------------------------------------------------
# Resolution: exactly-K rows per ray -> one sort + reshape
# --------------------------------------------------------------------------

def _resolve_closest(out, pair_ray, num_rp, k):
    """Winner per ray via sort((ray, t)) + reshape(R, K)[:, 0]."""
    pid = out[:, 3]
    t = jnp.where(pid >= 0.0, out[:, 0], BIG)
    _, _, tw, uw, vw, iw = jax.lax.sort(
        (pair_ray, t, t, out[:, 1], out[:, 2], pid), num_keys=2)
    tb = tw.reshape(num_rp, k)[:, 0]
    ub = uw.reshape(num_rp, k)[:, 0]
    vb = vw.reshape(num_rp, k)[:, 0]
    ib = iw.reshape(num_rp, k)[:, 0]
    found = tb < BIG
    return (jnp.where(found, tb, BIG),
            jnp.where(found, ib, -1.0).astype(jnp.int32),
            jnp.where(found, ub, 0.0), jnp.where(found, vb, 0.0))


def closest_hit_pairs(sbox, tiles, org, d, tmin, tmax, active=None,
                      inst=None, k_max=K_MAX):
    """Closest hit via the sorted pair queue, EXACT for every ray.

    Rays enter in MORTON order (the _sorted_dispatch wrapper): the queue
    sort is stable, so a super-chunk's pair run — and therefore each
    kernel block — holds spatially clustered rays that flag few chunk
    groups, instead of arbitrary rays paying every MT group of the tile
    (measured 48 ms kernel time of an 87 ms scattered dispatch at 24k
    tris before the reorder, scripts/pairs_ablate.py)."""
    from .pallas_stream import _sorted_dispatch

    return _sorted_dispatch(
        lambda sb, ti, o, dd, t0, t1, active=None, inst=None:
            _closest_hit_pairs_raw(sb, ti, o, dd, t0, t1, active=active,
                                   inst=inst, k_max=k_max),
        sbox, tiles, org, d, tmin, tmax, active, inst)


def _closest_hit_pairs_raw(sbox, tiles, org, d, tmin, tmax, active=None,
                           inst=None, k_max=K_MAX):
    """The queue + kernel + resolve pipeline; exact via the saturation
    fallback (rays with more true candidates than the top-K cap re-trace
    through the compacted stream kernel — statically skipped when the
    scene has <= k_max super-chunks).

    PASSES == 2 recovers the stream kernel's early termination: pass 1
    intersects only each ray's NEAREST candidate (most closest-hit rays
    resolve there); pass 2 runs the remaining candidates with the
    per-ray tmax clamped to the pass-1 best, so the kernel's chunk/MT
    culling skips everything provably behind it."""
    from ..render.traverse import Hit

    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    num_rp = rays8t.shape[1]                  # padded to BLK
    rays8 = rays8t.T                          # (Rp, 8)
    num_s = sbox.shape[0]

    if PASSES == 2:
        idx, ent, count, mindrop = ray_candidates(rays8t, sbox, k_max,
                                                  with_ents=True)
        k = idx.shape[1]
        # Nearest candidate per ray: unrolled argmin over the k columns.
        near_ent = ent[:, 0]
        near_col = jnp.zeros((num_rp,), jnp.int32)
        for j in range(1, k):
            closer = ent[:, j] < near_ent
            near_ent = jnp.where(closer, ent[:, j], near_ent)
            near_col = jnp.where(closer, j, near_col)
        # Unrolled column select (take_along_axis on a tiny minor axis
        # lowers as a slow gather on this TPU).
        near_sc = idx[:, 0]
        for j in range(1, k):
            near_sc = jnp.where(near_col == j, idx[:, j], near_sc)
        near_sc = near_sc[:, None]

        rows1, scc1, pr1, b1 = build_queue(near_sc, rays8, num_s)
        out1 = _pairs_call(rows1, scc1, b1, tiles, occl=False, inst=inst)
        t1, pid1, u1, v1 = _resolve_closest(out1, pr1, num_rp, 1)

        # Pass 2: the other candidates whose entry precedes the pass-1
        # best t (misses keep t1 = BIG -> everything stays).
        col_iota = jnp.arange(k, dtype=jnp.int32)[None, :]
        keep = (idx >= 0) & (col_iota != near_col[:, None]) & (
            ent < t1[:, None])
        idx2 = jnp.where(keep, idx, -1)
        rays8_2 = rays8.at[:, 7].set(jnp.minimum(rays8[:, 7], t1))
        rows2, scc2, pr2, b2 = build_queue(idx2, rays8_2, num_s)
        out2 = _pairs_call(rows2, scc2, b2, tiles, occl=False, inst=inst)
        t2, pid2, u2, v2 = _resolve_closest(out2, pr2, num_rp, k)

        better = t2 < t1
        t = jnp.where(better, t2, t1)[:num_r]
        pid = jnp.where(better, pid2, pid1)[:num_r]
        u = jnp.where(better, u2, u1)[:num_r]
        v = jnp.where(better, v2, v1)[:num_r]
    else:
        idx, _ent, count, mindrop = ray_candidates(rays8t, sbox, k_max)

        rows, sc_col, pair_ray, bounds = build_queue(idx, rays8, num_s)
        out = _pairs_call(rows, sc_col, bounds, tiles, occl=False,
                          inst=inst)
        t, pid, u, v = _resolve_closest(out, pair_ray, num_rp,
                                        idx.shape[1])
        t, pid, u, v = t[:num_r], pid[:num_r], u[:num_r], v[:num_r]

    if num_s > k_max:
        # The outer Morton wrapper already sorted the rays; dispatch the
        # stream kernel directly (no second sort round trip).
        from .pallas_stream import closest_hit_stream

        # A saturated ray is still EXACT when its hit is closer than
        # every dropped candidate's entry t.
        sat = (count[:num_r] > idx.shape[1]) & (
            (pid < 0) | (t > mindrop[:num_r]))
        if active is not None:
            sat = sat & active

        # lax.cond: the fallback dispatch only runs when saturated rays
        # actually exist.
        def fb(_):
            h2 = closest_hit_stream(sbox, tiles, org, d, tmin, tmax,
                                    active=sat, inst=inst)
            return (jnp.where(sat, h2.t, t),
                    jnp.where(sat, h2.prim_id, pid),
                    jnp.where(sat, h2.u, u),
                    jnp.where(sat, h2.v, v))

        t, pid, u, v = jax.lax.cond(
            jnp.any(sat), fb, lambda _: (t, pid, u, v), None)
    return Hit(t=jnp.where(pid >= 0, t, BIG), prim_id=pid, u=u, v=v)


def any_hit_pairs(sbox, tiles, org, d, tmin, tmax, active=None, inst=None,
                  k_max=K_MAX):
    """Occlusion via the sorted pair queue (Morton-fed, see
    closest_hit_pairs)."""
    from .pallas_stream import _sorted_dispatch

    return _sorted_dispatch(
        lambda sb, ti, o, dd, t0, t1, active=None, inst=None:
            _any_hit_pairs_raw(sb, ti, o, dd, t0, t1, active=active,
                               inst=inst, k_max=k_max),
        sbox, tiles, org, d, tmin, tmax, active, inst)


def _any_hit_pairs_raw(sbox, tiles, org, d, tmin, tmax, active=None,
                       inst=None, k_max=K_MAX):
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    num_rp = rays8t.shape[1]
    rays8 = rays8t.T
    num_s = sbox.shape[0]
    idx, _ent, count, _mindrop = ray_candidates(rays8t, sbox, k_max)

    rows, sc_col, pair_ray, bounds = build_queue(idx, rays8, num_s)
    out = _pairs_call(rows, sc_col, bounds, tiles, occl=True, inst=inst)
    _, occ_s = jax.lax.sort((pair_ray, out[:, 0]), num_keys=1)
    occk = occ_s.reshape(num_rp, idx.shape[1])
    occ = occk[:, 0]
    for c in range(1, idx.shape[1]):          # tiny-minor-axis reduce:
        occ = jnp.maximum(occ, occk[:, c])    # unrolled column max
    occ = occ > 0.0
    occ = occ[:num_r]

    if num_s > k_max:
        from .pallas_stream import any_hit_stream

        # Saturated AND not already proven occluded within the K nearest.
        sat = (count[:num_r] > idx.shape[1]) & ~occ
        if active is not None:
            sat = sat & active

        def fb(_):
            occ2 = any_hit_stream(sbox, tiles, org, d, tmin, tmax,
                                  active=sat, inst=inst)
            return occ | (sat & occ2)

        occ = jax.lax.cond(jnp.any(sat), fb, lambda _: occ, None)
    return occ
