"""Ablate the streamed kernel to find the per-candidate cost breakdown.

Levels:
  0 = full kernel
  1 = no MT (compaction still runs)
  2 = no compaction/MT (superchunk slab + any only)
  3 = DMA + loop only (no slab/any)
  4 = loop only (no DMA)
  5 = kernel body empty (grid + pipeline overhead)
  6 = no kernel at all (XLA candidates pass only)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imbatracer_tpu.ops import pallas_stream as ps
from imbatracer_tpu.ops.pallas_stream import (
    BLK, SUPER, TILE_ROWS, TRI_ROWS, NGROUP, BIG,
    _ray_cols, _slab_row, _chunk_slab, _mt_group, _compact_groups,
    superchunk_candidates, _rays8t,
)
from bench_stream import boxes_scene, primary_rays, scattered_rays


def make_kernel(level):
    def kern(rays_ref, sbox_ref, slist_ref, scount_ref, tiles_ref,
             out_ref, best_ref, tile_ref, gflag_ref, glist_ref, gcnt_ref,
             sem_ref):
        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
        zeros = jnp.zeros_like(ox)
        best_ref[:, 0:1] = tmax
        best_ref[:, 1:2] = zeros
        best_ref[:, 2:3] = zeros
        best_ref[:, 3:4] = zeros - 1.0
        n = scount_ref[0, 0, 0]

        def tile_dma(k, slot):
            sc = slist_ref[0, 0, k]
            return pltpu.make_async_copy(
                tiles_ref.at[sc], tile_ref.at[slot], sem_ref.at[slot]
            )

        if level <= 4:
            if level <= 3:
                @pl.when(n > 0)
                def _():
                    tile_dma(0, 0).start()

            def body(k, _):
                slot = jax.lax.rem(k, 2)
                if level <= 3:
                    @pl.when(k + 1 < n)
                    def _():
                        tile_dma(k + 1, 1 - slot).start()
                    tile_dma(k, slot).wait()

                if level <= 2:
                    sc = slist_ref[0, 0, k]
                    sb = sbox_ref[pl.ds(sc, 1), :]
                    stn, stf = _slab_row(sb, ox, oy, oz, ix, iy, iz)
                    s_ok = (stn <= stf) & (stf >= tmin) & (stn <= best_ref[:, 0:1])

                    @pl.when(jnp.any(s_ok))
                    def _():
                        if level <= 1:
                            tn, tf = _chunk_slab(tile_ref, slot, ox, oy, oz, ix, iy, iz)
                            cm = (tn <= tf) & (tf >= tmin) & (tn <= best_ref[:, 0:1])
                            _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

                            if level == 0:
                                def mt_body(j, _):
                                    g = glist_ref[j]
                                    best_t = best_ref[:, 0:1]
                                    t, u, v, tid, ok = _mt_group(
                                        tile_ref, slot, g, ox, oy, oz, dx, dy, dz, tmin, best_t)
                                    t = jnp.where(ok, t, BIG)
                                    t_min = jnp.min(t, axis=1, keepdims=True)
                                    improved = t_min < best_t
                                    sel = t == t_min
                                    pick = lambda a: jnp.max(jnp.where(sel, a, -BIG), axis=1, keepdims=True)
                                    best_ref[:, 0:1] = jnp.where(improved, t_min, best_t)
                                    best_ref[:, 1:2] = jnp.where(improved, pick(u), best_ref[:, 1:2])
                                    best_ref[:, 2:3] = jnp.where(improved, pick(v), best_ref[:, 2:3])
                                    best_ref[:, 3:4] = jnp.where(improved, pick(tid * jnp.ones_like(u)), best_ref[:, 3:4])
                                    return 0
                                jax.lax.fori_loop(0, gcnt_ref[0], mt_body, 0)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

        out_ref[:, 0:4] = best_ref[:, 0:4]
        out_ref[:, 4:8] = jnp.concatenate([zeros] * 4, axis=1)
    return kern


def call_level(level, raysT, sbox, slist, scount, tiles):
    num_r = raysT.shape[0]
    num_s = sbox.shape[0]
    return pl.pallas_call(
        make_kernel(level),
        out_shape=jax.ShapeDtypeStruct((num_r, 8), jnp.float32),
        grid=(num_r // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_s, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, slist.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BLK, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLK, 8), jnp.float32),
            pltpu.VMEM((2, TILE_ROWS, TRI_ROWS), jnp.float32),
            pltpu.VMEM((NGROUP, 1), jnp.int32),
            pltpu.SMEM((NGROUP,), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(raysT, sbox, slist, scount, tiles)


def run(level, sboxj, tilesj, org, d, iters=16):
    def make(k):
        @jax.jit
        def go(org, d):
            def body(i, acc):
                rays8t, _ = _rays8t(org + acc * 1e-30, d, 0.0, BIG, None)
                if level <= 5:
                    slist, scount = superchunk_candidates(rays8t, sboxj)
                    out = call_level(level, rays8t.T, sboxj, slist, scount, tilesj)
                    return acc + jnp.tanh(jnp.sum(out[:, 0] * 1e-9))
                else:
                    slist, scount = superchunk_candidates(rays8t, sboxj)
                    return acc + jnp.tanh(jnp.sum(slist[:, 0, 0].astype(jnp.float32) * 1e-9) + jnp.sum(scount.astype(jnp.float32)) * 1e-9)
            return jax.lax.fori_loop(0, k, body, 0.0)
        return go

    f1, f2 = make(4), make(4 + iters)
    jax.block_until_ready(f1(org, d)); jax.block_until_ready(f2(org, d))
    t0 = time.perf_counter(); jax.block_until_ready(f1(org, d))
    t1 = time.perf_counter(); jax.block_until_ready(f2(org, d))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    n = org.shape[0]
    print(f"level {level}: {per * 1e3:.2f} ms ({n / per / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    tb = boxes_scene(2_000)
    sbox, tiles = ps.pack_stream_tiles(tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
    sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
    org, d = primary_rays(1 << 18)
    # mean candidate count
    rays8t, _ = _rays8t(org, d, 0.0, BIG, None)
    _, scount = jax.jit(lambda r: superchunk_candidates(r, sboxj))(rays8t)
    print("superchunks:", sbox.shape[0],
          " mean cand/block:", float(jnp.mean(scount.astype(jnp.float32))),
          " max:", int(jnp.max(scount)))
    for level in (6, 5, 4, 3, 2, 1, 0):
        run(level, sboxj, tilesj, org, d)
