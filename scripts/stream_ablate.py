"""Ablate the streamed kernel to find the per-candidate cost breakdown.

Levels:
  6  = no kernel at all (XLA candidates pass only)
  5  = kernel body empty (grid + pipeline overhead)
  4  = early-exit while loop only (no DMA/work; bound never shrinks)
  3  = 4 + double-buffered DMA + drain
  2  = 3 + per-candidate superchunk slab re-check
  1  = 2 + chunk slab + group compaction
  0  = full kernel (VPU feature-form MT, production)
  f0 = full kernel but fori loop over all n candidates (no early exit)
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
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
    BLK, SUPER, TILE_ROWS, TRI_ROWS, NGROUP, GROUP, BIG,
    _ray_cols, _slab_row, _chunk_slab, _mt_group, _compact_groups,
    superchunk_candidates, _rays8t,
)
from bench_stream import boxes_scene, primary_rays, scattered_rays


def make_kernel(level):
    early_exit = level != "f0"
    lvl = 0 if level == "f0" else level

    def kern(rays_ref, sbox_ref, slist_ref, skey_ref, scount_ref, tiles_ref,
             out_ref, acc_ref, tile_ref, gflag_ref, glist_ref, gcnt_ref,
             stop_ref, pend_ref, sem_ref):
        ox, oy, oz, tmin, dx, dy, dz, tmax, ix, iy, iz = _ray_cols(rays_ref)
        zeros = jnp.zeros_like(ox)
        acc_ref[:, 0:1] = tmax
        acc_ref[:, 1:2] = zeros
        acc_ref[:, 2:3] = zeros
        acc_ref[:, 3:4] = zeros - 1.0
        stop_ref[0] = jnp.max(tmax)
        pend_ref[0] = -1
        n = scount_ref[0, 0, 0]

        cc = (oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx)

        def tile_dma(k, slot):
            sc = slist_ref[0, 0, k]
            return pltpu.make_async_copy(
                tiles_ref.at[sc], tile_ref.at[slot], sem_ref.at[slot]
            )

        rc = (ox, oy, oz, dx, dy, dz, cc[0], cc[1], cc[2])

        def body_common(k, slot):
            if lvl <= 3:
                tile_dma(k, slot).wait()
                pend_ref[0] = -1
                if early_exit:
                    @pl.when((k + 1 < n) & (skey_ref[0, 0, k + 1] < stop_ref[0]))
                    def _():
                        tile_dma(k + 1, 1 - slot).start()
                        pend_ref[0] = 1 - slot
                else:
                    @pl.when(k + 1 < n)
                    def _():
                        tile_dma(k + 1, 1 - slot).start()

            if lvl <= 2:
                sc = slist_ref[0, 0, k]
                sb = sbox_ref[pl.ds(sc, 1), :]
                stn, stf = _slab_row(sb, ox, oy, oz, ix, iy, iz)
                s_ok = (stn <= stf) & (stf >= tmin) & (stn <= acc_ref[:, 0:1])

                @pl.when(jnp.any(s_ok))
                def _():
                    if lvl <= 1:
                        tn, tf = _chunk_slab(tile_ref, slot, ox, oy, oz, ix, iy, iz)
                        cm = (tn <= tf) & (tf >= tmin) & (tn <= acc_ref[:, 0:1])
                        _compact_groups(cm, gflag_ref, glist_ref, gcnt_ref)

                        if lvl == 0:
                            def mt_body(j, _):
                                g = glist_ref[j]
                                best_t = acc_ref[:, 0:1]
                                t, u, v, tid, ok = _mt_group(
                                    tile_ref, slot, g, rc, tmin, best_t)
                                t = jnp.where(ok, t, BIG)
                                t_min = jnp.min(t, axis=1, keepdims=True)
                                improved = t_min < best_t
                                sel = t == t_min
                                pick = lambda a: jnp.max(jnp.where(sel, a, -BIG), axis=1, keepdims=True)
                                acc_ref[:, 0:1] = jnp.where(improved, t_min, best_t)
                                acc_ref[:, 1:2] = jnp.where(improved, pick(u), acc_ref[:, 1:2])
                                acc_ref[:, 2:3] = jnp.where(improved, pick(v), acc_ref[:, 2:3])
                                acc_ref[:, 3:4] = jnp.where(improved, pick(tid * jnp.ones_like(u)), acc_ref[:, 3:4])
                                return 0
                            jax.lax.fori_loop(0, gcnt_ref[0], mt_body, 0)
                            if early_exit:
                                stop_ref[0] = jnp.max(acc_ref[:, 0:1])

        if lvl <= 4:
            if lvl <= 3:
                @pl.when(n > 0)
                def _():
                    tile_dma(0, 0).start()
                    pend_ref[0] = 0

            if early_exit:
                def body(carry):
                    k, _ = carry
                    slot = jax.lax.rem(k, 2)
                    body_common(k, slot)
                    nk = k + 1
                    go = (nk < n) & (skey_ref[0, 0, nk] < stop_ref[0])
                    return nk, go
                jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))
            else:
                def body(k, _):
                    slot = jax.lax.rem(k, 2)
                    body_common(k, slot)
                    return 0
                jax.lax.fori_loop(0, n, body, 0)

            @pl.when(pend_ref[0] >= 0)
            def _():
                pltpu.make_async_copy(
                    tiles_ref.at[0], tile_ref.at[pend_ref[0]],
                    sem_ref.at[pend_ref[0]]
                ).wait()

        out_ref[:, 0:4] = acc_ref[:, 0:4]
        out_ref[:, 4:8] = jnp.concatenate([zeros] * 4, axis=1)
    return kern


def call_level(level, raysT, sbox, slist, skey, scount, tiles):
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
            pl.BlockSpec((1, 1, skey.shape[2]), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
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
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(raysT, sbox, slist, skey, scount, tiles)


def run(level, sboxj, tilesj, org, d, iters=16):
    def make(k):
        @jax.jit
        def go(org, d):
            def body(i, acc):
                rays8t, _ = _rays8t(org + acc * 1e-30, d, 0.0, BIG, None)
                slist, skey, scount = superchunk_candidates(rays8t, sboxj)
                if level == 6:
                    return acc + jnp.tanh(jnp.sum(slist[:, 0, 0].astype(jnp.float32) * 1e-9) + jnp.sum(scount.astype(jnp.float32)) * 1e-9)
                out = call_level(level, rays8t.T, sboxj, slist, skey, scount, tilesj)
                return acc + jnp.tanh(jnp.sum(out[:, 0] * 1e-9))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return go

    f1, f2 = make(4), make(4 + iters)
    jax.block_until_ready(f1(org, d)); jax.block_until_ready(f2(org, d))
    t0 = time.perf_counter(); jax.block_until_ready(f1(org, d))
    t1 = time.perf_counter(); jax.block_until_ready(f2(org, d))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    n = org.shape[0]
    print(f"level {level}: {per * 1e3:.2f} ms ({n / per / 1e6:.1f} Mrays/s)", flush=True)


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    ray_kind = sys.argv[2] if len(sys.argv) > 2 else "primary"
    tb = boxes_scene(nb)
    sbox, tiles, center = ps.pack_stream_tiles(tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
    sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
    rays_fn = primary_rays if ray_kind == "primary" else scattered_rays
    org, d = rays_fn(1 << 18)
    org = org - center[None, :]
    rays8t, _ = _rays8t(org, d, 0.0, BIG, None)
    _, _, scount = jax.jit(lambda r: superchunk_candidates(r, sboxj))(rays8t)
    print("superchunks:", sbox.shape[0],
          " mean cand/block:", float(jnp.mean(scount.astype(jnp.float32))),
          " max:", int(jnp.max(scount)), flush=True)
    import ast
    levels = sys.argv[3].split(",") if len(sys.argv) > 3 else ["6", "5", "4", "3", "2", "1", "f0", "0"]
    for level in levels:
        lv = int(level) if level.isdigit() else level
        run(lv, sboxj, tilesj, org, d)
