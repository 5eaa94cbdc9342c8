"""A/B: IMBA_SORT_KEY variants for incoherent (sort=True) stream
dispatches, scattered 262k rays at 24k and 264k tris — the round-4
divergence lever.  Round-4 late variant: "octant" = direction-octant
MAJOR, Morton minor — a scattered batch sorted position-major packs
mixed-direction rays per block, so the kernel's front-to-back
early-exit bound (candidate list ordered by block-min entry t, a
direction-dependent order) never fires; octant-major blocks share a
traversal direction.  ("chunk" measured neutral, chain17.)
Exactness is structural (any permutation); this measures
throughput only, plus hit-count agreement as a cheap self-check.

One process, slope-method timing (bench_stream.bench pattern)."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_stream import boxes_scene, scattered_rays
from imbatracer_tpu.ops import pallas_stream as ps


def bench_sorted(sboxj, tilesj, org, d, label, iters=24):
    def make(k):
        @jax.jit
        def run(org, d):
            def body(i, acc):
                h = ps.closest_hit_sorted(sboxj, tilesj, org + acc * 1e-30,
                                          d, 0.0, ps.BIG)
                return acc + jnp.tanh(jnp.sum(h.t * 1e-9))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    n = org.shape[0]
    f1, f2 = make(4), make(4 + iters)
    jax.block_until_ready(f1(org, d)); jax.block_until_ready(f2(org, d))
    t0 = time.perf_counter(); jax.block_until_ready(f1(org, d))
    t1 = time.perf_counter(); jax.block_until_ready(f2(org, d))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    print(f"{label}: {per * 1e3:.2f} ms / {n} rays -> "
          f"{n / per / 1e6:.2f} Mrays/s", flush=True)

    @jax.jit
    def hits(org, d):
        h = ps.closest_hit_sorted(sboxj, tilesj, org, d, 0.0, ps.BIG)
        return jnp.sum(h.prim_id >= 0), jnp.sum(jnp.where(
            h.prim_id >= 0, h.t, 0.0))
    nh, st = hits(org, d)
    return int(nh), float(st)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    n = 1 << 18
    for nb, lbl in ((2_000, "24k"), (22_000, "264k")):
        tb = boxes_scene(nb)
        sbox, tiles, center = ps.pack_stream_tiles(
            tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
        sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
        print(f"--- scene {lbl} ({tb.tri_v0.shape[0]} packed tris, "
              f"{sbox.shape[0]} super-chunks)", flush=True)
        org, d = scattered_rays(n)
        org = org - center[None, :]
        checks = {}
        for key in ("morton", "octant"):
            os.environ["IMBA_SORT_KEY"] = key
            checks[key] = bench_sorted(sboxj, tilesj, org, d,
                                       f"{lbl} scattered key={key}")
        os.environ.pop("IMBA_SORT_KEY", None)
        nh_m, st_m = checks["morton"]
        nh_c, st_c = checks["octant"]
        ok = nh_m == nh_c and abs(st_m - st_c) <= 1e-4 * max(abs(st_m), 1.0)
        print(f"{lbl} selfcheck hits {nh_m}=={nh_c} tsum "
              f"{st_m:.4f}~{st_c:.4f}: {'PASS' if ok else 'FAIL'}",
              flush=True)
