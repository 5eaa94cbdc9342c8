"""Stage-level cost breakdown of the round-3 sort-only pair queue (TPU).

Times, with the slope method (K reps inside one jit, difference of two
rep counts), each stage of ops/pallas_pairs.py:
  1. ray_candidates      (slab sweep + top_k)
  2. build_queue         (the ONE queue sort)
  3. kernel              (span-join pallas call)
  4. resolve             (the ONE result sort + reshape)
  5. end-to-end closest_hit_pairs / any_hit_pairs
on the 24k and 264k boxes scenes, scattered and tiled-primary rays —
so the next optimisation targets the measured bottleneck, not a guess.
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.ops import pallas_pairs as pp
from imbatracer_tpu.ops import pallas_stream as ps

sys.path.insert(0, "/root/repo/scripts")
from bench_stream import boxes_scene, primary_rays, scattered_rays


def slope(fn, *args, iters=16):
    def make(k):
        @jax.jit
        def run(*a):
            def body(i, acc):
                out = fn(*a, salt=acc * 1e-30)
                return acc + out
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    f1, f2 = make(4), make(4 + iters)
    jax.block_until_ready(f1(*args)); jax.block_until_ready(f2(*args))
    t0 = time.perf_counter(); jax.block_until_ready(f1(*args))
    t1 = time.perf_counter(); jax.block_until_ready(f2(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 1 << 18
    for nb, lbl in ((2_000, "24k"), (22_000, "264k")):
        tb = boxes_scene(nb)
        sbox, tiles, center = ps.pack_stream_tiles(
            tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
        sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
        num_s = sbox.shape[0]
        print(f"--- scene {lbl}: {num_s} super-chunks", flush=True)

        for rname, rfn in (("scattered", scattered_rays),
                           ("tiled-prim", lambda n: primary_rays(n, tile=16))):
            org, d = rfn(n)
            org = org - center[None, :]
            rays8t, _ = pp._rays8t(org, d, 0.0, ps.BIG, None)
            rays8 = rays8t.T
            idx, ent, count, mindrop = pp.ray_candidates(rays8t, sboxj)
            sat = float(jnp.mean((count > pp.K_MAX).astype(jnp.float32)))
            avg = float(jnp.mean(count.astype(jnp.float32)))
            print(f"  [{rname}] candidates/ray avg {avg:.1f}, "
                  f"saturated {100*sat:.2f}%", flush=True)

            def s_cand(rays8t, salt=0.0):
                i, e, c, m = pp.ray_candidates(rays8t + salt, sboxj)
                return (jnp.sum(e * 1e-12) + jnp.sum(m * 1e-12)
                        + jnp.sum(i).astype(jnp.float32) * 1e-12)

            def s_queue(idx, rays8, salt=0.0):
                rows, scc, pr, bounds = pp.build_queue(idx, rays8 + salt,
                                                       num_s)
                return (jnp.sum(rows[:, 0]) * 1e-12
                        + jnp.sum(scc) * 1e-12)

            rows, scc, pr, bounds = pp.build_queue(idx, rays8, num_s)

            def s_kernel(rows, scc, bounds, salt=0.0):
                out = pp._pairs_call(rows + salt, scc, bounds, tilesj)
                return jnp.tanh(jnp.sum(out[:, 0]) * 1e-9)

            out = pp._pairs_call(rows, scc, bounds, tilesj)

            def s_resolve(out, pr, salt=0.0):
                t, pid, u, v = pp._resolve_closest(out + salt, pr,
                                                   rays8.shape[0],
                                                   pp.K_MAX)
                return jnp.tanh(jnp.sum(t) * 1e-9)

            def s_e2e(org, d, salt=0.0):
                h = pp.closest_hit_pairs(sboxj, tilesj, org + salt, d,
                                         0.0, ps.BIG)
                return jnp.tanh(jnp.sum(h.t) * 1e-9)

            def s_occ(org, d, salt=0.0):
                o = pp.any_hit_pairs(sboxj, tilesj, org + salt, d,
                                     0.0, jnp.full((n,), 10.0))
                return jnp.sum(o.astype(jnp.float32)) * 1e-9

            # A/B the candidate formulations (first-k rank arithmetic vs
            # per-row top_k by entry t).
            for mode in (True, False):
                pp.FIRST_K = mode
                try:
                    dt = slope(s_cand, rays8t)
                    print(f"  [{rname}] candidates "
                          f"({'first-k' if mode else 'top_k '}): "
                          f"{dt*1e3:8.2f} ms", flush=True)
                except Exception as e:
                    print(f"  [{rname}] candidates({mode}): FAILED "
                          f"{type(e).__name__}", flush=True)
            pp.FIRST_K = True

            # 1-pass vs 2-pass closest schedule.
            for passes in (1, 2):
                pp.PASSES = passes
                try:
                    dt = slope(s_e2e, org, d)
                    print(f"  [{rname}] e2e closest (PASSES={passes}): "
                          f"{dt*1e3:8.2f} ms -> {n/dt/1e6:6.1f} Mrays/s",
                          flush=True)
                except Exception as e:
                    print(f"  [{rname}] e2e PASSES={passes}: FAILED "
                          f"{type(e).__name__}", flush=True)
            pp.PASSES = 1

            for name, fn, args in (
                ("candidates", s_cand, (rays8t,)),
                ("queue sort", s_queue, (idx, rays8)),
                ("kernel    ", s_kernel, (rows, scc, bounds)),
                ("resolve   ", s_resolve, (out, pr)),
                ("e2e closest", s_e2e, (org, d)),
                ("e2e anyhit ", s_occ, (org, d)),
            ):
                try:
                    dt = slope(fn, *args)
                    extra = ""
                    if name.startswith("e2e"):
                        extra = f"  -> {n / dt / 1e6:6.1f} Mrays/s"
                    print(f"  [{rname}] {name}: {dt*1e3:8.2f} ms{extra}",
                          flush=True)
                except Exception as e:
                    print(f"  [{rname}] {name}: FAILED {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
