"""Round-4 traversal experiment: per-lane skip-link walk with a
data-dependent while loop on big-scene SCATTERED rays.

Rationale: scripts/probe_while_cost.py (r4) measured lax.while_loop
iteration overhead at ~0 ms/iter on this pool — the round-1 "33 ms/iter
host sync" that exiled the threaded walk to CPU no longer holds.  The
hardware bound for a per-lane walk is the gather rate (~0.9 ms per
262k-lane wide-record gather): at a mean of ~60-150 visited nodes per
scattered ray this lands at 1.5-4.8 Mrays/s — potentially 3-9x the
sorted-stream kernel's 0.53 Mrays/s at 264k tris (results/r4_pairs_ab),
and EXACT (no top-K saturation fallback).

Variants: Morton+octant-sorted rays (gather locality + tighter per-band
worst case) vs unsorted; single 262k dispatch vs 8/32 sub-bands (the
while trip count is the per-dispatch WORST lane; banding turns max into
banded-max).  Reports Mrays/s, trip counts, and agreement vs the stream
kernel.

Writes results/r4_skiplink.txt.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_stream import boxes_scene, scattered_rays

from imbatracer_tpu.accel.device import DeviceBvh
from imbatracer_tpu.ops import pallas_stream as ps
from imbatracer_tpu.render import traverse as tv

OUT = "/root/repo/results/r4_skiplink.txt"
BIG = 1e30
CAP = 16384  # runaway guard only; the while exits when every lane is done


def log(line):
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def _skiplink_band(bvh, org, d, tmin, tmax):
    """Closest-hit skip-link walk, data-dependent while loop.  Returns
    (trip_count, Hit) for one band of rays."""
    (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmin, tmax, start) = tv._prep(
        org, d, tmin, tmax, None)
    table, start = tv._octant_start(bvh, start, dx, dy, dz)
    init = (jnp.int32(0), start, tmax, jnp.zeros_like(start) - 1,
            jnp.zeros_like(tmin), jnp.zeros_like(tmin))

    def cond(s):
        return (s[0] < CAP) & jnp.any(s[1] >= 0)

    def body(s):
        k, node_raw, best_t, best_id, best_u, best_v = s
        act = node_raw >= 0
        node = jnp.maximum(node_raw, 0)
        rec_t, box_hit, hit_link, miss_link, leaf_id = tv._node_fetch(
            table, node, ox, oy, oz, ix, iy, iz, tmin, best_t, act)
        do_leaf = box_hit & (leaf_id >= 0)
        leaf_t = rec_t[12:60]
        for j in range(tv.LEAF_WIDTH):
            t, u, v, tid, ok = tv._mt_packet(
                leaf_t, j, ox, oy, oz, dx, dy, dz, tmin, best_t, None)
            closer = ok & do_leaf
            best_t = jnp.where(closer, t, best_t)
            best_id = jnp.where(closer, tid, best_id)
            best_u = jnp.where(closer, u, best_u)
            best_v = jnp.where(closer, v, best_v)
        nxt = jnp.where(box_hit, hit_link, miss_link)
        return (k + 1, jnp.where(act, nxt, -1), best_t, best_id, best_u,
                best_v)

    k, _, t, pid, u, v = jax.lax.while_loop(cond, body, init)
    t = jnp.where(pid >= 0, t, BIG)
    return k, tv.Hit(t=t, prim_id=pid, u=u, v=v)


@partial(jax.jit, static_argnames=("bands", "sort"))
def skiplink_closest(bvh, org, d, lo, hi, *, bands, sort):
    num_r = org.shape[0]
    tmin = jnp.zeros((num_r,), jnp.float32)
    tmax = jnp.full((num_r,), BIG, jnp.float32)
    if sort:
        key = ps.sort_keys(org, d, jnp.ones((num_r,), jnp.bool_), lo, hi)
        iota = jnp.arange(num_r, dtype=jnp.int32)
        _, perm = jax.lax.sort((key, iota), num_keys=1)
        org, d = org[perm], d[perm]
    if bands == 1:
        k, hit = _skiplink_band(bvh, org, d, tmin, tmax)
        ks = k[None]
    else:
        rb = num_r // bands

        def one(i):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * rb, rb)
            return _skiplink_band(bvh, sl(org), sl(d), sl(tmin), sl(tmax))

        ks, hit = jax.lax.map(one, jnp.arange(bands))
        hit = tv.Hit(t=hit.t.reshape(-1), prim_id=hit.prim_id.reshape(-1),
                     u=hit.u.reshape(-1), v=hit.v.reshape(-1))
    if sort:
        _, inv = jax.lax.sort((perm, iota), num_keys=1)
        hit = tv.Hit(t=hit.t[inv], prim_id=hit.prim_id[inv], u=hit.u[inv],
                     v=hit.v[inv])
    return ks, hit


def time_it(fn, reps=8):
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
    log(f"# skiplink scatter  backend={jax.default_backend()}  cap={CAP}")
    for nb, label in ((22000, "264k"), (2000, "24k")):
        tb = boxes_scene(nb)
        xbvh = DeviceBvh.from_threaded(tb, mode="xla")
        sbox_np, tiles_np, center = ps.pack_stream_tiles(
            tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
        sbox, tiles = jnp.asarray(sbox_np), jnp.asarray(tiles_np)
        lo, hi = ps._scene_bounds(sbox)
        org, d = scattered_rays(1 << 18, seed=4)
        num_r = org.shape[0]
        log(f"[{label}] nodes={xbvh.nodes64.shape[0]} "
            f"octants={'yes' if xbvh.nodes64o is not None else 'no'}")

        # Reference result for agreement (exact stream kernel).
        ref = ps.closest_hit_sorted(sbox, tiles, org - center[None, :], d,
                                    jnp.zeros((num_r,)),
                                    jnp.full((num_r,), BIG))
        ref_id = np.asarray(ref.prim_id)
        ref_t = np.asarray(ref.t)

        for bands, sort in ((1, False), (1, True), (8, True), (32, True)):
            def fn(i, bands=bands, sort=sort):
                ks, hit = skiplink_closest(xbvh, org + 0.0 * i, d, lo, hi,
                                           bands=bands, sort=sort)
                return ks, hit.t * hit.t + hit.u  # nonlinear consume

            ks, hit = skiplink_closest(xbvh, org, d, lo, hi, bands=bands,
                                       sort=sort)
            hid, ht = np.asarray(hit.prim_id), np.asarray(hit.t)
            same = (hid == ref_id) | (np.abs(ht - ref_t)
                                      <= 1e-4 * np.maximum(ref_t, 1.0))
            ks = np.asarray(ks)
            ms = time_it(fn)
            log(f"[{label}] bands={bands:2d} sort={int(sort)}: "
                f"{ms:8.1f} ms ({num_r / ms / 1e3:5.2f} Mrays/s)  "
                f"trips max={ks.max()} mean={ks.mean():.0f}  "
                f"agree={same.mean():.4f}")


if __name__ == "__main__":
    main()
