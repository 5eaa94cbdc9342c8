"""Round-4 item 3: pairs candidate-selection A/B on TPU.

SEL=front (new: front-to-back top-K via iterative argmin; mindrop = the
(k+1)-th nearest entry so the saturation fallback only fires when the
true hit lies beyond the K nearest chunks) vs SEL=first (round 3) on the
decisive case: 262k scattered rays, 264k-tri boxes scene, end-to-end
closest_hit_pairs / any_hit_pairs (queue build + kernel + resolve +
fallback), plus the sorted-stream baseline and the fallback-rate
diagnostic.  Target (VERDICT): >= 5 Mrays/s end-to-end scattered.

Writes results/r4_pairs_ab.txt.  Run ONE SEL per process (module-level
knob): IMBA_PAIRS_SEL=front python scripts/r4_pairs_ab.py
"""

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

from imbatracer_tpu.ops import pallas_pairs as pp
from imbatracer_tpu.ops import pallas_stream as ps

OUT = "/root/repo/results/r4_pairs_ab.txt"
BIG = 1e30


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def time_end2end(fn, reps=8):
    out = fn(0)
    jax.block_until_ready(out)
    t0 = time.time()
    o = None
    for i in range(1, reps + 1):
        o = fn(i)
    jax.block_until_ready(o)
    return (time.time() - t0) / reps * 1e3


def main():
    os.makedirs("/root/repo/results", exist_ok=True)
    sel = pp.SEL
    log(f"# pairs A/B  SEL={sel}  backend={jax.default_backend()}")
    for nb, label in ((22000, "264k"), (4000, "48k")):
        tb = boxes_scene(nb)
        sbox_np, tiles_np, center = ps.pack_stream_tiles(
            tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
        sbox, tiles = jnp.asarray(sbox_np), jnp.asarray(tiles_np)
        org, d = scattered_rays(1 << 18, seed=4)
        org = org - center[None, :]
        num_r = org.shape[0]

        # Fallback-rate diagnostic (the round-3 killer): fraction of rays
        # the saturation fallback re-traces.
        rays8t, _ = ps._rays8t(org, d, 0.0, BIG, None)
        idx, ent, count, mindrop = pp.ray_candidates(rays8t, sbox)
        k = idx.shape[1]
        hit = pp._closest_hit_pairs_raw(sbox, tiles, org, d, 0.0, BIG)
        sat_total = float(jnp.mean((count[:num_r] > k).astype(jnp.float32)))
        sat_fb = float(jnp.mean(((count[:num_r] > k) & (
            (hit.prim_id < 0) | (hit.t > mindrop[:num_r]))).astype(
                jnp.float32)))
        log(f"[{label}] saturated {sat_total*100:.1f}% of rays; "
            f"fallback re-traces {sat_fb*100:.1f}%  (k={k})")

        @jax.jit
        def pairs_ch(i):
            h = pp.closest_hit_pairs(sbox, tiles, org + 0.0 * i, d, 0.0,
                                     BIG)
            return h.t * h.t + h.u

        @jax.jit
        def stream_ch(i):
            h = ps.closest_hit_sorted(sbox, tiles, org + 0.0 * i, d, 0.0,
                                      BIG)
            return h.t * h.t + h.u

        for name, fn in (("pairs", pairs_ch), ("sorted-stream", stream_ch)):
            ms = time_end2end(fn)
            log(f"[{label}] {name:14s} closest scattered: {ms:7.1f} ms  "
                f"({num_r / ms / 1e3:.2f} Mrays/s)")

        @jax.jit
        def pairs_ah(i):
            return jnp.sum(pp.any_hit_pairs(
                sbox, tiles, org + 0.0 * i, d, 0.0,
                jnp.full((num_r,), 30.0)).astype(jnp.float32))

        ms = time_end2end(pairs_ah)
        log(f"[{label}] pairs any_hit scattered: {ms:7.1f} ms  "
            f"({num_r / ms / 1e3:.2f} Mrays/s)")


if __name__ == "__main__":
    main()
