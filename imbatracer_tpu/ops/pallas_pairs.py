"""Pair-stream traversal: (ray x super-chunk) pairs, zero block divergence.

The block-synchronous streaming kernel (ops/pallas_stream.py) walks a
*per-block* candidate list: all 512 rays of a block test every candidate
any of them needs, so incoherent batches waste ~10-100x of the MT work on
rays that never wanted the tile (measured: scattered rays 0.6 Mrays/s vs
11.8 tiled-primary on the same scene).  This module restructures the work
stream instead of the rays: the XLA side enumerates exactly the
(ray, super-chunk) PAIRS that intersect, sorts them by super-chunk, pads
each super-chunk's run to the block size, and the kernel processes
single-super-chunk blocks — every lane in a block wants the resident
tile, coherent or not.  This is the reference external kernels' role
(render/scheduling/ray_queue.h:254-341) realised as a sorted work queue,
the classic "ray stream" formulation.

Early termination across candidates (the stream kernel's shrinking
best-t bound) is recovered with a two-pass schedule:
  pass 1: each ray's NEAREST candidate only (most closest-hit rays
          resolve here — front-to-back, exact for a hit inside it);
  pass 2: remaining candidates of rays whose pass-1 result does not
          prove closest (hit beyond the next candidate's entry t, or
          miss), filtered by the pass-1 best t.
Occlusion queries run pass 1 over all pairs of unresolved rays at once
(no ordering needed) after a nearest-candidate pass.

Per-ray candidates are capped at K_MAX (top-K by entry t): a ray with
more candidates is only correct within its K nearest — callers needing
exactness on such rays use the block-stream kernel (traverse.py routes
by scene size; ray_candidates returns the true per-ray count so tests
can assert non-saturation on the target scenes).

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
    TILE_ROWS,
    TRI_ROWS,
    NGROUP,
    _chunk_slab,
    _compact_groups,
    _mt_group,
    _ray_cols,
    _rays8t,
)

K_MAX = 8
RAY_CHUNK = 1 << 15      # per-ray candidate pass ray-chunking (VMEM bound)


# --------------------------------------------------------------------------
# XLA side: per-ray candidates and pair queues
# --------------------------------------------------------------------------

def _safe_inv(x):
    s = jnp.where(x >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(x), 1e-12)


def ray_candidates(rays8t, sbox, k_max=K_MAX):
    """Top-k_max super-chunk candidates per RAY, front-to-back.

    Returns (idx (R, K) i32 — -1 past the ray's count, ent (R, K) f32
    entry t (BIG where invalid), count (R,) i32 total intersected —
    may exceed K; callers compare against K to detect saturation)."""
    num_s = sbox.shape[0]
    num_r = rays8t.shape[1]
    outs_i, outs_e, outs_c = [], [], []
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
        count = jnp.sum(ent_all < BIG, axis=1).astype(jnp.int32)
        k = min(k_max, num_s)
        neg, idx = jax.lax.top_k(-ent_all, k)
        ent = -neg
        idx = jnp.where(ent < BIG, idx.astype(jnp.int32), -1)
        if k < k_max:
            pad = k_max - k
            idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=-1)
            ent = jnp.pad(ent, ((0, 0), (0, pad)), constant_values=BIG)
        outs_i.append(idx)
        outs_e.append(ent)
        outs_c.append(count)
    return (jnp.concatenate(outs_i), jnp.concatenate(outs_e),
            jnp.concatenate(outs_c))


def build_pairs(sc, ray, valid, num_s, max_pairs):
    """Sort (sc, ray) pairs by super-chunk and pad each run to BLK.

    sc/ray/valid: flat (P,) candidate pairs (sc in [0, num_s)).
    Returns (pair_ray (max_pairs,) i32 — -1 padding, block_sc
    (max_pairs/BLK,) i32 — -1 for empty blocks)."""
    sentinel = jnp.int32(num_s)
    key = jnp.where(valid, sc, sentinel)
    key_s, ray_s = jax.lax.sort((key, ray.astype(jnp.int32)), num_keys=1)

    counts = jax.ops.segment_sum(
        jnp.where(valid, 1, 0), jnp.where(valid, sc, num_s),
        num_segments=num_s + 1,
    )[:num_s]
    padded = ((counts + BLK - 1) // BLK) * BLK
    offs = jnp.cumsum(padded) - padded                     # start per sc
    # rank of each sorted pair within its sc run
    csum = jnp.cumsum(counts)
    start_of = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                csum[:-1].astype(jnp.int32)])
    pos = jnp.arange(key_s.shape[0], dtype=jnp.int32)
    rank = pos - jnp.where(key_s < sentinel, start_of[jnp.minimum(key_s, num_s - 1)], 0)
    tgt = jnp.where(key_s < sentinel,
                    offs[jnp.minimum(key_s, num_s - 1)] + rank,
                    max_pairs)
    pair_ray = jnp.full((max_pairs,), -1, jnp.int32)
    pair_ray = pair_ray.at[tgt].set(ray_s, mode="drop")

    nblocks = max_pairs // BLK
    block_starts = jnp.arange(nblocks, dtype=jnp.int32) * BLK
    # block b belongs to sc s iff offs[s] <= start < offs[s] + padded[s]
    ends = offs + padded
    sc_of_block = jnp.searchsorted(ends, block_starts, side="right")
    in_range = block_starts < ends[jnp.minimum(sc_of_block, num_s - 1)]
    block_sc = jnp.where(
        in_range & (sc_of_block < num_s),
        sc_of_block.astype(jnp.int32), -1,
    )
    return pair_ray, block_sc


# --------------------------------------------------------------------------
# Kernel: one super-chunk per block
# --------------------------------------------------------------------------

def _make_pair_kernel(occl: bool, instanced: bool):
    def kernel(*refs):
        if instanced:
            (rays_ref, bsc_ref, tidx_ref, iinst_ref, itab_ref, tiles_ref,
             out_ref, acc_ref, tile_ref, gflag_ref, glist_ref, gcnt_ref,
             last_ref, sem_ref) = refs
        else:
            (rays_ref, bsc_ref, tiles_ref, out_ref, acc_ref, tile_ref,
             gflag_ref, glist_ref, gcnt_ref, last_ref, sem_ref) = refs

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            last_ref[0] = -1          # scratch is uninitialised at start

        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
        zeros = jnp.zeros_like(ox)
        if occl:
            acc_ref[:, 0:1] = zeros
        else:
            acc_ref[:, 0:1] = tmax
            acc_ref[:, 1:2] = zeros
            acc_ref[:, 2:3] = zeros
            acc_ref[:, 3:4] = zeros - 1.0

        sc = bsc_ref[0, 0, 0]

        @pl.when(sc >= 0)
        def _():
            ti = tidx_ref[0, 0, sc] if instanced else sc

            @pl.when(ti != last_ref[0])
            def _():
                cp = pltpu.make_async_copy(
                    tiles_ref.at[ti], tile_ref.at[0], sem_ref.at[0]
                )
                cp.start()
                cp.wait()
                last_ref[0] = ti

            if instanced:
                ii = iinst_ref[0, 0, sc]
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

            tn, tf = _chunk_slab(tile_ref, 0, cox, coy, coz, cix, ciy, ciz)
            limit0 = tmax if occl else acc_ref[:, 0:1]
            cm = (tn <= tf) & (tf >= tmin) & (tn <= limit0)
            _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

            def mt_body(j, _):
                g = glist_ref[j]
                limit = tmax if occl else acc_ref[:, 0:1]
                t, u, v, tid, ok = _mt_group(tile_ref, 0, g, rc, tmin, limit)
                if occl:
                    found = jnp.max(jnp.where(ok, 1.0, 0.0), axis=1,
                                    keepdims=True)
                    acc_ref[:, 0:1] = jnp.maximum(acc_ref[:, 0:1], found)
                    return 0
                if id_off is not None:
                    tid = tid + id_off
                best_t = acc_ref[:, 0:1]
                t = jnp.where(ok, t, BIG)
                t_min = jnp.min(t, axis=1, keepdims=True)
                improved = t_min < best_t
                sel = t == t_min
                pick = lambda a: jnp.max(
                    jnp.where(sel, a, -BIG), axis=1, keepdims=True
                )
                acc_ref[:, 0:1] = jnp.where(improved, t_min, best_t)
                acc_ref[:, 1:2] = jnp.where(improved, pick(u), acc_ref[:, 1:2])
                acc_ref[:, 2:3] = jnp.where(improved, pick(v), acc_ref[:, 2:3])
                acc_ref[:, 3:4] = jnp.where(
                    improved, pick(tid * jnp.ones_like(u)), acc_ref[:, 3:4]
                )
                return 0

            jax.lax.fori_loop(0, gcnt_ref[0], mt_body, 0)

        if occl:
            out_ref[:, 0:1] = acc_ref[:, 0:1]
            out_ref[:, 1:8] = jnp.concatenate([zeros] * 7, axis=1)
        else:
            out_ref[:, 0:4] = acc_ref[:, 0:4]
            out_ref[:, 4:8] = jnp.concatenate([zeros] * 4, axis=1)

    return kernel


def _pairs_call(pair_rays, block_sc3, tiles, occl=False, inst=None):
    num_p = pair_rays.shape[0]
    nblocks = num_p // BLK
    instanced = inst is not None
    in_specs = [
        pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [pair_rays, block_sc3]
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
        _make_pair_kernel(occl, instanced),
        out_shape=jax.ShapeDtypeStruct((num_p, 8), jnp.float32),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, 1 if occl else 8), jnp.float32),
            pltpu.VMEM((1, TILE_ROWS, TRI_ROWS), jnp.float32),
            pltpu.VMEM((NGROUP, 1), jnp.int32),
            pltpu.SMEM((NGROUP,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )(*args)


# --------------------------------------------------------------------------
# Pass orchestration
# --------------------------------------------------------------------------

def _gather_pair_rays(rays8, pair_ray):
    """(R, 8) ray rows -> (P, 8) pair rows; padding lanes inactive."""
    safe = jnp.maximum(pair_ray, 0)
    rows = rays8[safe]
    dead = (pair_ray < 0)[:, None]
    # tmax = -1 marks inactive lanes for the kernel
    rows = jnp.where(dead, jnp.zeros_like(rows).at[:, 7].set(-1.0), rows)
    return rows


def _run_pass(rays8, sc, ray, valid, num_s, max_pairs, tiles, occl, inst,
              tmax_override=None):
    pair_ray, block_sc = build_pairs(sc, ray, valid, num_s, max_pairs)
    rows = _gather_pair_rays(rays8, pair_ray)
    if tmax_override is not None:
        per_pair = tmax_override[jnp.maximum(pair_ray, 0)]
        rows = rows.at[:, 7].set(
            jnp.where(pair_ray >= 0, per_pair, -1.0))
    out = _pairs_call(rows, block_sc[:, None, None], tiles, occl=occl,
                      inst=inst)
    return out, pair_ray


def _segment_best(out, pair_ray, num_r):
    """Per-ray closest hit over pair results: (t, u, v, id)."""
    t = jnp.where(pair_ray >= 0, out[:, 0], BIG)
    hit = out[:, 3] >= 0.0
    t = jnp.where(hit, t, BIG)
    seg = jnp.where(pair_ray >= 0, pair_ray, num_r)
    best_t = jax.ops.segment_min(t, seg, num_segments=num_r + 1)[:num_r]
    # winner rows: t equals the segment min (ties keep both; pick via
    # another segment_min over packed payload to stay deterministic)
    is_best = (t <= best_t[jnp.minimum(pair_ray, num_r - 1)]) & (pair_ray >= 0) & hit
    payload_id = jnp.where(is_best, out[:, 3], BIG)
    best_id = jax.ops.segment_min(payload_id, seg, num_segments=num_r + 1)[:num_r]
    pick = is_best & (out[:, 3] == best_id[jnp.minimum(pair_ray, num_r - 1)])
    u = jax.ops.segment_max(jnp.where(pick, out[:, 1], -BIG), seg,
                            num_segments=num_r + 1)[:num_r]
    v = jax.ops.segment_max(jnp.where(pick, out[:, 2], -BIG), seg,
                            num_segments=num_r + 1)[:num_r]
    found = best_t < BIG
    return (jnp.where(found, best_t, BIG),
            jnp.where(found, best_id, -1.0).astype(jnp.int32),
            jnp.where(found, u, 0.0), jnp.where(found, v, 0.0))


# Pass schedule: 1 = one machinery round over all K candidates per ray
# (lowest fixed overhead — the XLA sorts/scatters/segment ops dominate
# the measured cost); 2 = nearest-candidate pass + best-t-filtered
# remainder (fewer kernel pairs, double machinery).
PASSES = 1


def closest_hit_pairs(sbox, tiles, org, d, tmin, tmax, active=None,
                      inst=None, k_max=K_MAX, passes=None):
    from ..render.traverse import Hit

    passes = PASSES if passes is None else passes
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    num_rp = rays8t.shape[1]                  # padded to BLK
    rays8 = rays8t.T                          # (Rp, 8)
    num_s = sbox.shape[0]
    idx, ent, _count = ray_candidates(rays8t, sbox, k_max)
    ridx = jnp.arange(num_rp, dtype=jnp.int32)

    if passes == 1:
        rayk = jnp.broadcast_to(ridx[:, None], idx.shape)
        mp = num_rp * idx.shape[1] + num_s * BLK
        out, pr = _run_pass(
            rays8, jnp.maximum(idx.reshape(-1), 0), rayk.reshape(-1),
            (idx >= 0).reshape(-1), num_s, mp, tiles, False, inst,
        )
        t, pid, u, v = _segment_best(out, pr, num_rp)
        t, pid, u, v = t[:num_r], pid[:num_r], u[:num_r], v[:num_r]
        return Hit(t=jnp.where(pid >= 0, t, BIG), prim_id=pid, u=u, v=v)

    # ---- pass 1: nearest candidate per ray -------------------------------
    sc1 = idx[:, 0]
    valid1 = sc1 >= 0
    mp1 = num_rp + num_s * BLK
    out1, pr1 = _run_pass(rays8, jnp.maximum(sc1, 0), ridx, valid1,
                          num_s, mp1, tiles, False, inst)
    t1, id1, u1, v1 = _segment_best(out1, pr1, num_rp)

    # ---- pass 2: remaining candidates filtered by pass-1 best t ----------
    k2 = idx.shape[1] - 1
    sc2 = idx[:, 1:]                                       # (R, K-1)
    need = (sc2 >= 0) & (ent[:, 1:] < t1[:, None])
    ray2 = jnp.broadcast_to(ridx[:, None], sc2.shape)
    mp2 = num_rp * k2 + num_s * BLK
    out2, pr2 = _run_pass(
        rays8, jnp.maximum(sc2.reshape(-1), 0), ray2.reshape(-1),
        need.reshape(-1), num_s, mp2, tiles, False, inst,
        tmax_override=t1,
    )
    t2, id2, u2, v2 = _segment_best(out2, pr2, num_rp)

    better = t2 < t1
    t = jnp.where(better, t2, t1)[:num_r]
    pid = jnp.where(better, id2, id1)[:num_r]
    u = jnp.where(better, u2, u1)[:num_r]
    v = jnp.where(better, v2, v1)[:num_r]
    return Hit(t=jnp.where(pid >= 0, t, BIG), prim_id=pid, u=u, v=v)


def any_hit_pairs(sbox, tiles, org, d, tmin, tmax, active=None, inst=None,
                  k_max=K_MAX, passes=None):
    passes = PASSES if passes is None else passes
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    num_rp = rays8t.shape[1]
    rays8 = rays8t.T
    num_s = sbox.shape[0]
    idx, ent, _count = ray_candidates(rays8t, sbox, k_max)
    ridx = jnp.arange(num_rp, dtype=jnp.int32)

    if passes == 1:
        rayk = jnp.broadcast_to(ridx[:, None], idx.shape)
        mp = num_rp * idx.shape[1] + num_s * BLK
        out, pr = _run_pass(
            rays8, jnp.maximum(idx.reshape(-1), 0), rayk.reshape(-1),
            (idx >= 0).reshape(-1), num_s, mp, tiles, True, inst,
        )
        seg = jnp.where(pr >= 0, pr, num_rp)
        occ = jax.ops.segment_max(
            jnp.where(pr >= 0, out[:, 0], 0.0), seg,
            num_segments=num_rp + 1,
        )[:num_rp] > 0.0
        return occ[:num_r]

    # pass 1: nearest candidate (cheap resolve for most shadow rays)
    sc1 = idx[:, 0]
    mp1 = num_rp + num_s * BLK
    out1, pr1 = _run_pass(rays8, jnp.maximum(sc1, 0), ridx, sc1 >= 0,
                          num_s, mp1, tiles, True, inst)
    seg1 = jnp.where(pr1 >= 0, pr1, num_rp)
    occ1 = jax.ops.segment_max(
        jnp.where(pr1 >= 0, out1[:, 0], 0.0), seg1,
        num_segments=num_rp + 1,
    )[:num_rp] > 0.0

    # pass 2: all remaining candidates of unresolved rays
    k2 = idx.shape[1] - 1
    sc2 = idx[:, 1:]
    need = (sc2 >= 0) & ~occ1[:, None]
    ray2 = jnp.broadcast_to(ridx[:, None], sc2.shape)
    mp2 = num_rp * k2 + num_s * BLK
    out2, pr2 = _run_pass(
        rays8, jnp.maximum(sc2.reshape(-1), 0), ray2.reshape(-1),
        need.reshape(-1), num_s, mp2, tiles, True, inst,
    )
    seg2 = jnp.where(pr2 >= 0, pr2, num_rp)
    occ2 = jax.ops.segment_max(
        jnp.where(pr2 >= 0, out2[:, 0], 0.0), seg2,
        num_segments=num_rp + 1,
    )[:num_rp] > 0.0
    return (occ1 | occ2)[:num_r]
