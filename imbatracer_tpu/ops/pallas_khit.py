"""Pallas TPU kernel: K-nearest-hit ray-stream traversal (alpha masks).

Round 4.  The exact masked path re-walks the WHOLE stream kernel once
per transparent surface crossed (traverse._closest_hit_masked): a leaf-
canopy frame measured 5.9x its opaque cost (results/bench_masked.csv,
8561 vs 1459 ms) because every round pays full dispatch machinery to
advance ONE masked layer.  The reference's masked kernels alpha-test
in-traversal (core/mask.h, ray_queue.h:254-341); Mosaic cannot gather
textures per lane, so the TPU equivalent is to return the K=4 NEAREST
hits per walk and alpha-test them vectorised on the XLA side — one
dispatch resolves up to 4 stacked masked surfaces (rounds / 4).

Kernel = pallas_stream's closest-hit walk (same tiles, candidates,
DMA/early-exit structure) with the column-best epilogue generalised to
a per-column 4-slot sorted insertion:

* cols_ref holds (4 slots x 4 fields = 16, BLK, GROUP) running state;
  an MT candidate bubbles down the slot chain with pure elementwise
  selects (no cross-lane reductions in the group loop — the round-3
  rule, pallas_stream._make_kernel docstring).
* Early-exit bound: a column's slot-3 t is the 4th-nearest WITHIN that
  column >= the ray's true 4th-nearest overall (subset argument), so
  bound = min over columns of slot-3 is always safe, and costs the same
  ONE cross-lane reduction per candidate as the single-hit kernel.
* Final resolve, once per block: 4 iterative masked-min picks over the
  concatenated slot planes (ties broken by max id, duplicates excluded
  by id match).

Output: (R, 32) rows = rays, hit k at columns 8k..8k+3 = [t u v id],
sorted by t; id < 0 marks "fewer than k+1 hits in (tmin, tmax)".
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from .pallas_stream import (BIG, BLK, GROUP, NGROUP, TILE_ROWS, TRI_ROWS,
                            _chunk_slab, _compact_groups, _mt_group,
                            _ray_cols, _rays8t, _scene_bounds, _slab_row,
                            sort_keys, superchunk_candidates)

# Hits returned per dispatch.  Larger K resolves deeper masked stacks per
# round but pays a weaker early-exit bound (the walk prunes on the K-th
# nearest, not the 1st) and K x slot-insertion work per candidate; K=4
# took the canopy frame from 5.9x to 2.5x its opaque cost
# (results/bench_masked.csv).  Env-tunable for A/B runs (shallow mask
# stacks may prefer K=2: most of the per-trace cost is the FIRST
# dispatch, whose bound tightness scales with K).
K = int(os.environ.get("IMBA_KHIT_K", "4"))


def _khit_kernel(*refs):
    (rays_ref, sbox_ref, slist_ref, skey_ref, scount_ref, tiles_ref,
     out_ref, acc_ref, tile_ref, gflag_ref, glist_ref, gcnt_ref,
     stop_ref, pend_ref, sem_ref, cols_ref) = refs

    ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
    zeros = jnp.zeros_like(ox)

    tmax_cols = jnp.broadcast_to(tmax, (BLK, GROUP))
    for s in range(K):
        cols_ref[4 * s + 0, :, :] = tmax_cols       # t (empty slot = tmax)
        cols_ref[4 * s + 1, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
        cols_ref[4 * s + 2, :, :] = jnp.zeros((BLK, GROUP), jnp.float32)
        cols_ref[4 * s + 3, :, :] = jnp.full((BLK, GROUP), -1.0,
                                             jnp.float32)
    acc_ref[:, 0:1] = tmax                           # per-ray 4th-best bound
    stop_ref[0] = jnp.max(tmax)
    pend_ref[0] = -1

    n = scount_ref[0, 0, 0]
    rc0 = (ox, oy, oz, dx, dy, dz,
           oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx)

    def tile_dma(k, slot):
        sc = slist_ref[0, 0, k]
        return pltpu.make_async_copy(
            tiles_ref.at[sc], tile_ref.at[slot], sem_ref.at[slot]
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

        @pl.when((k + 1 < n) & (skey_ref[0, 0, k + 1] < stop_ref[0]))
        def _():
            tile_dma(k + 1, 1 - slot).start()
            pend_ref[0] = 1 - slot

        sc = slist_ref[0, 0, k]
        sb = sbox_ref[pl.ds(sc, 1), :]
        stn, stf = _slab_row(sb, ox, oy, oz, ix, iy, iz)
        s_ok = (stn <= stf) & (stf >= tmin) & (stn <= acc_ref[:, 0:1])

        @pl.when(jnp.any(s_ok))
        def _():
            tn, tf = _chunk_slab(tile_ref, slot, ox, oy, oz, ix, iy, iz)
            cm = (tn <= tf) & (tf >= tmin) & (tn <= acc_ref[:, 0:1])
            _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

            def mt_body(j, _):
                g = glist_ref[j]
                t, u, v, tid, ok = _mt_group(
                    tile_ref, slot, g, rc0, tmin, acc_ref[:, 0:1]
                )
                # Sorted 4-slot insertion per lane column — the candidate
                # bubbles down, displaced entries carry on.  Elementwise
                # selects only (round-3 rule: no cross-lane reductions in
                # the group loop).
                t = jnp.where(ok, t, BIG)
                uc, vc = u, v
                idc = jnp.where(ok, tid * jnp.ones_like(u), -1.0)
                for s in range(K):
                    st = cols_ref[4 * s + 0, :, :]
                    su = cols_ref[4 * s + 1, :, :]
                    sv = cols_ref[4 * s + 2, :, :]
                    sid = cols_ref[4 * s + 3, :, :]
                    c = t < st
                    cols_ref[4 * s + 0, :, :] = jnp.where(c, t, st)
                    cols_ref[4 * s + 1, :, :] = jnp.where(c, uc, su)
                    cols_ref[4 * s + 2, :, :] = jnp.where(c, vc, sv)
                    cols_ref[4 * s + 3, :, :] = jnp.where(c, idc, sid)
                    t = jnp.where(c, st, t)
                    uc = jnp.where(c, su, uc)
                    vc = jnp.where(c, sv, vc)
                    idc = jnp.where(c, sid, idc)
                return 0

            jax.lax.fori_loop(0, gcnt_ref[0], mt_body, 0)

            # ONE cross-lane reduction per candidate: a column's slot-3 t
            # is that column's 4th nearest >= the ray's global 4th
            # nearest, so min-over-columns is a safe shrinking bound.
            acc_ref[:, 0:1] = jnp.minimum(
                acc_ref[:, 0:1],
                jnp.min(cols_ref[4 * (K - 1), :, :], axis=1, keepdims=True))
            stop_ref[0] = jnp.max(acc_ref[:, 0:1])

        nk = k + 1
        go = (nk < n) & (skey_ref[0, 0, nk] < stop_ref[0])
        return nk, go

    jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))

    @pl.when(pend_ref[0] >= 0)
    def _():
        pltpu.make_async_copy(
            tiles_ref.at[0], tile_ref.at[pend_ref[0]],
            sem_ref.at[pend_ref[0]]
        ).wait()

    # Final resolve, once per block: pick the K nearest (t,u,v,id) per
    # ray out of the K*GROUP slot columns.
    tcat = jnp.concatenate([cols_ref[4 * s + 0, :, :] for s in range(K)],
                           axis=1)
    ucat = jnp.concatenate([cols_ref[4 * s + 1, :, :] for s in range(K)],
                           axis=1)
    vcat = jnp.concatenate([cols_ref[4 * s + 2, :, :] for s in range(K)],
                           axis=1)
    icat = jnp.concatenate([cols_ref[4 * s + 3, :, :] for s in range(K)],
                           axis=1)
    valid = icat >= 0.0
    tval = jnp.where(valid, tcat, BIG)
    for k in range(K):
        cur = jnp.min(tval, axis=1, keepdims=True)
        sel = (tval == cur) & valid
        # Real hits are strictly < BIG (MT limit <= tmax <= BIG), so a
        # BIG minimum means the ray has no k-th hit.
        got = ((jnp.max(jnp.where(sel, 1.0, 0.0), axis=1, keepdims=True)
                > 0.0) & (cur < BIG))
        pid = jnp.max(jnp.where(sel, icat, -BIG), axis=1, keepdims=True)
        win = sel & (icat == pid)
        pick = lambda a: jnp.max(jnp.where(win, a, -BIG), axis=1,
                                 keepdims=True)
        out_ref[:, 8 * k + 0 : 8 * k + 1] = jnp.where(got, cur, BIG)
        out_ref[:, 8 * k + 1 : 8 * k + 2] = jnp.where(got, pick(ucat), 0.0)
        out_ref[:, 8 * k + 2 : 8 * k + 3] = jnp.where(got, pick(vcat), 0.0)
        out_ref[:, 8 * k + 3 : 8 * k + 4] = jnp.where(got, pid, -1.0)
        out_ref[:, 8 * k + 4 : 8 * k + 8] = jnp.concatenate([zeros] * 4,
                                                            axis=1)
        tval = jnp.where(win, BIG, tval)
        valid = valid & ~win  # a picked winner must not re-match later


def _khit_call(raysT, sbox, slist, skey, scount, tiles):
    num_r = raysT.shape[0]
    num_s = sbox.shape[0]
    in_specs = [
        pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((num_s, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, slist.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, skey.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    return pl.pallas_call(
        _khit_kernel,
        out_shape=jax.ShapeDtypeStruct((num_r, 8 * K), jnp.float32),
        grid=(num_r // BLK,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BLK, 8 * K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, 1), jnp.float32),             # acc (bound)
            pltpu.VMEM((2, TILE_ROWS, TRI_ROWS), jnp.float32),
            pltpu.VMEM((NGROUP, 1), jnp.int32),
            pltpu.SMEM((NGROUP,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((4 * K, BLK, GROUP), jnp.float32),  # slot planes
        ],
    )(raysT, sbox, slist, skey, scount, tiles)


def khit_sorted(sbox, tiles, org, d, tmin, tmax, active=None):
    """K nearest hits per ray, Morton-sorted dispatch (non-instanced).

    Returns (t, u, v, id), each (R, K), sorted by t per ray; id < 0
    marks absent hits.  Callers recentre origins (traverse.py does)."""
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    act = jnp.ones((num_r,), jnp.bool_) if active is None else active
    lo, hi = _scene_bounds(sbox)
    key = sort_keys(org, d, act, lo, hi)
    iota = jnp.arange(num_r, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1)

    rays8t, _ = _rays8t(org[perm], d[perm], tmin[perm], tmax[perm],
                        act[perm])
    slist, skey, scount = superchunk_candidates(rays8t, sbox)
    out = _khit_call(rays8t.T, sbox, slist, skey, scount, tiles)[:num_r]

    _, inv = jax.lax.sort((perm, iota), num_keys=1)
    out = out[inv]
    t = jnp.stack([out[:, 8 * k + 0] for k in range(K)], axis=1)
    u = jnp.stack([out[:, 8 * k + 1] for k in range(K)], axis=1)
    v = jnp.stack([out[:, 8 * k + 2] for k in range(K)], axis=1)
    pid = jnp.stack([out[:, 8 * k + 3] for k in range(K)],
                    axis=1).astype(jnp.int32)
    return t, u, v, pid
