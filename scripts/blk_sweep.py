"""Sweep the stream kernel's ray-block size (BLK).

Smaller blocks = more coherent candidate lists (fewer wasted MT groups
per ray) but worse amortisation of per-candidate fixed costs (DMA wait,
slab re-check, compaction pl.whens).  Measures tiled-primary and sorted-
scattered rays on the 24k-tri boxes scene."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.ops import pallas_stream as ps
from bench_stream import boxes_scene, primary_rays, scattered_rays


def bench(sboxj, tilesj, org, d, label, sort, iters=16):
    hit_fn = ps.closest_hit_sorted if sort else ps.closest_hit_stream

    def make(k):
        @jax.jit
        def run(org, d):
            def body(i, acc):
                h = hit_fn(sboxj, tilesj, org + acc * 1e-30, d, 0.0, ps.BIG)
                return acc + jnp.tanh(jnp.sum(h.t * 1e-9))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    f1, f2 = make(4), make(4 + iters)
    jax.block_until_ready(f1(org, d)); jax.block_until_ready(f2(org, d))
    t0 = time.perf_counter(); jax.block_until_ready(f1(org, d))
    t1 = time.perf_counter(); jax.block_until_ready(f2(org, d))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    n = org.shape[0]
    print(f"  {label}: {per * 1e3:.2f} ms -> {n / per / 1e6:.1f} Mrays/s",
          flush=True)


if __name__ == "__main__":
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000
    blks = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2
                             else ["128", "256", "512"])]
    tb = boxes_scene(nb)
    sbox, tiles, center = ps.pack_stream_tiles(
        tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
    sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
    n = 1 << 18
    op, dp = primary_rays(n, tile=16)
    osc, dsc = scattered_rays(n)
    op = op - center[None, :]
    osc = osc - center[None, :]
    print(f"scene: {tb.tri_v0.shape[0]} packed tris, {sbox.shape[0]} "
          f"superchunks", flush=True)
    for blk in blks:
        ps.BLK = blk
        print(f"BLK={blk}", flush=True)
        try:
            bench(sboxj, tilesj, op, dp, "primary tiled ", False)
            bench(sboxj, tilesj, osc, dsc, "scattered sort", True)
        except Exception as e:
            print(f"  FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
