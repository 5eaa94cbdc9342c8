"""Pallas TPU kernel: VMEM-resident traversal for small scenes (<=8k tris).

The cornell-family scenes (1-3k triangles — every quality gate measures
on them) sit in an awkward regime: too big for the fully unrolled dense
mode (compile cost), too small for the HBM-streamed machinery to pay off
— the stream/pair paths spend more on per-dispatch XLA work (Morton
sorts, candidate lists, queue sorts, row gathers ~15 ms at 262k rays)
than on intersection.  Here the WHOLE feature-tile set rides in VMEM as
a pallas_call input (<= 8 super-chunks = 768 KB), and every block walks
every super-chunk with the usual three-level cull (super-chunk slab ->
chunk slab -> compacted MT groups) and the reduction-free column-best
epilogue from ops/pallas_stream.py.  No DMA, no SMEM lists, no sorting,
no gathers — dispatch cost is pure kernel time, identical for coherent
and incoherent batches.

Plays the role of the reference's CPU packet kernels on small scenes
(render/scheduling/ray_queue.h:254-341); replaces round 1's deleted
chunked-VMEM kernel with the round-3 kernel idioms."""

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
    _slab_row,
)

VMEM_MAX_SUPER = 8     # tiles kept resident: 8 x 96 KB

# Flip to run the kernel in interpreter mode (CPU tests).
INTERPRET = False


def _make_vmem_kernel(occl: bool, num_s: int):
    def kernel(rays_ref, sbox_ref, tiles_ref, out_ref, acc_ref, gflag_ref,
               glist_ref, gcnt_ref, cols_ref):
        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
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

        rc = (ox, oy, oz, dx, dy, dz,
              oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx)

        for sc in range(num_s):              # static unroll, S <= 8
            sb = sbox_ref[sc : sc + 1, :]
            stn, stf = _slab_row(sb, ox, oy, oz, ix, iy, iz)
            if occl:
                live = ~(acc_ref[:, 0:1] > 0.0)
                s_ok = (stn <= stf) & (stf >= tmin) & (stn <= tmax) & live
            else:
                s_ok = (stn <= stf) & (stf >= tmin) & (stn <= acc_ref[:, 0:1])

            @pl.when(jnp.any(s_ok))
            def _(sc=sc):
                tn, tf = _chunk_slab(tiles_ref, sc, ox, oy, oz, ix, iy, iz)
                if occl:
                    alive = ~(acc_ref[:, 0:1] > 0.0)
                    cm = (tn <= tf) & (tf >= tmin) & (tn <= tmax) & alive
                else:
                    cm = (tn <= tf) & (tf >= tmin) & (tn <= acc_ref[:, 0:1])
                _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

                def mt_body(j, _):
                    g = glist_ref[j]
                    limit = tmax if occl else acc_ref[:, 0:1]
                    t, u, v, tid, ok = _mt_group(tiles_ref, sc, g, rc,
                                                 tmin, limit)
                    if occl:
                        cols_ref[0, :, :] = jnp.maximum(
                            cols_ref[0, :, :], jnp.where(ok, 1.0, 0.0))
                        return 0
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

                if occl:
                    acc_ref[:, 0:1] = jnp.max(cols_ref[0, :, :], axis=1,
                                              keepdims=True)
                else:
                    acc_ref[:, 0:1] = jnp.minimum(
                        acc_ref[:, 0:1],
                        jnp.min(cols_ref[0, :, :], axis=1, keepdims=True))

        if occl:
            out_ref[:, 0:1] = acc_ref[:, 0:1]
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


def _vmem_call(raysT, sbox, tiles, occl=False):
    num_r = raysT.shape[0]
    num_s = sbox.shape[0]
    return pl.pallas_call(
        _make_vmem_kernel(occl, num_s),
        out_shape=jax.ShapeDtypeStruct((num_r, 8), jnp.float32),
        grid=(num_r // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_s, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_s, TILE_ROWS, TRI_ROWS), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, 1 if occl else 8), jnp.float32),
            pltpu.VMEM((NGROUP, 1), jnp.int32),
            pltpu.SMEM((NGROUP,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1 if occl else 4, BLK, GROUP), jnp.float32),
        ],
        interpret=INTERPRET,
    )(raysT, sbox, tiles)


def _sorted_vmem_call(sbox, tiles, org, d, tmin, tmax, active, occl):
    """Octant-major sorted vmem dispatch (round-5).

    The kernel's per-block cost scales with the UNION of MT groups its
    BLK lanes touch, so a scattered bounce batch pays ~3.4x a coherent
    one (22.2 vs 6.6 ms @256k, results/r5_qrow_split.txt).  Sorting by
    pallas_stream.sort_keys (direction-octant major, origin-Morton
    minor) restores block coherence, and dead lanes (max key) compact
    into trailing no-work blocks.

    Overhead is kept to TWO row gathers: the (R, 8) ray record is built
    first and permuted as one gather (not 6 per-array gathers — each
    dynamic gather costs a flat ~3.3 ms/M lanes), and the (R, 8) kernel
    output is un-permuted as one gather.  Exact under any permutation.
    """
    from .pallas_stream import _scene_bounds, sort_keys

    num_r = org.shape[0]
    act = jnp.ones((num_r,), jnp.bool_) if active is None else active
    lo, hi = _scene_bounds(sbox)
    key = sort_keys(org, d, act, lo, hi)
    iota = jnp.arange(num_r, dtype=jnp.int32)
    _, perm = jax.lax.sort((key, iota), num_keys=1)
    rays8t, _ = _rays8t(org, d, tmin, tmax, act)
    raysT = rays8t.T                                    # (Rp, 8)
    rp = raysT.shape[0]
    permp = (jnp.concatenate([perm, jnp.arange(num_r, rp, dtype=jnp.int32)])
             if rp > num_r else perm)
    out = _vmem_call(raysT[permp], sbox, tiles, occl=occl)
    _, inv = jax.lax.sort((perm, iota), num_keys=1)
    return out[inv]                                     # (num_r, 8)


def closest_hit_vmem_sorted(sbox, tiles, org, d, tmin, tmax, active=None,
                            inst=None):
    from ..render.traverse import Hit

    assert inst is None, "vmem mode is for non-instanced small scenes"
    out = _sorted_vmem_call(sbox, tiles, org, d, tmin, tmax, active,
                            occl=False)
    t = out[:, 0]
    prim_id = out[:, 3].astype(jnp.int32)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=out[:, 1], v=out[:, 2])


def any_hit_vmem_sorted(sbox, tiles, org, d, tmin, tmax, active=None,
                        inst=None):
    assert inst is None, "vmem mode is for non-instanced small scenes"
    out = _sorted_vmem_call(sbox, tiles, org, d, tmin, tmax, active,
                            occl=True)
    return out[:, 0] > 0.0


def closest_hit_vmem(sbox, tiles, org, d, tmin, tmax, active=None,
                     inst=None):
    from ..render.traverse import Hit

    assert inst is None, "vmem mode is for non-instanced small scenes"
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    out = _vmem_call(rays8t.T, sbox, tiles)[:num_r]
    t = out[:, 0]
    prim_id = out[:, 3].astype(jnp.int32)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=out[:, 1], v=out[:, 2])


def any_hit_vmem(sbox, tiles, org, d, tmin, tmax, active=None, inst=None):
    assert inst is None, "vmem mode is for non-instanced small scenes"
    rays8t, num_r = _rays8t(org, d, tmin, tmax, active)
    out = _vmem_call(rays8t.T, sbox, tiles, occl=True)[:num_r]
    return out[:, 0] > 0.0
