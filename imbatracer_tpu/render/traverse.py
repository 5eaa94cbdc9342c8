"""Stackless threaded-BVH traversal, tuned for the TPU memory system.

Replaces the reference's external AnyDSL kernels
`intersect_*_masked_instanced` / `occluded_*_masked_instanced`
(reference: render/scheduling/ray_queue.h:254-341, core/traversal_interface.h)
with an on-device, branch-free per-lane state machine:

    next = bbox_hit ? hit_link : miss_link

Each while-loop iteration advances *every* ray by one node; finished rays
idle at node == -1.  Two TPU-specific design rules (measured, see
scripts/profile_gather.py):

1. Gathers of wide contiguous rows (>= 8 f32) run ~100x faster than
   per-scalar or (N, 3)-row gathers -> exactly two gathers per step:
   one (R, 16) node record and one (R, 48) leaf record (4 packed
   triangles).  Integer links/ids travel as f32 bit patterns inside the
   records.
2. Reductions/selects over tiny minor axes (argmin over 4, take_along_axis)
   are slow -> the 4-wide leaf test is an unrolled sequential
   best-hit update over (R,)-shaped component arrays (transposed form).

Instancing is resolved at build time (world-space flattening); alpha masks
hook in via `alpha_fn(tri_id, u, v) -> opaque`.

Dense mode (`max_steps == -1`): for small scenes every ray tests every
packed triangle in a statically unrolled loop — zero gathers, pure fused
VPU arithmetic.  On this TPU a dynamic gather costs a flat ~3.3 ms per 1M
lanes regardless of table size (XLA lowers it near-serially), while fused
elementwise work is orders of magnitude cheaper, so exhaustive testing
wins decisively up to several hundred triangles.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..accel.device import DeviceBvh
from .intersect import BIG

LEAF_WIDTH = 4


class Hit(NamedTuple):
    t: jnp.ndarray        # (R,) f32; BIG on miss
    prim_id: jnp.ndarray  # (R,) i32 flat primitive id; -1 on miss
    u: jnp.ndarray        # (R,) f32 barycentric
    v: jnp.ndarray        # (R,) f32 barycentric


def _bits_to_i32(x):
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _components(a):
    return a[:, 0], a[:, 1], a[:, 2]


def _safe_inv(x, eps=1e-12):
    s = jnp.where(x >= 0.0, 1.0, -1.0)
    return s / jnp.maximum(jnp.abs(x), eps)


def _mt_packet(leaf_t, j, ox, oy, oz, dx, dy, dz, tmin, tmax, alpha_fn):
    """Moller-Trumbore for packed triangle j of the gathered leaf records.

    leaf_t is the TRANSPOSED record block (48, R): row slices are
    contiguous, column slices of the untransposed form are cross-lane
    shuffles (~6x slower per step, measured).  Returns (t, u, v, id, ok).
    """
    b = j * 12
    v0x, v0y, v0z = leaf_t[b + 0], leaf_t[b + 1], leaf_t[b + 2]
    e1x, e1y, e1z = leaf_t[b + 3], leaf_t[b + 4], leaf_t[b + 5]
    e2x, e2y, e2z = leaf_t[b + 6], leaf_t[b + 7], leaf_t[b + 8]
    tid = _bits_to_i32(leaf_t[b + 9])

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        (inv_det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > tmin)
        & (t < tmax)
        & (tid >= 0)
    )
    if alpha_fn is not None:
        # Transparency-masked traversal (reference: "masked" kernel
        # variants, core/mask.h): drop alpha-masked-out hits.
        ok = ok & alpha_fn(jnp.maximum(tid, 0), u, v)
    return t, u, v, tid, ok


def _prep(org, d, tmin, tmax, active):
    num_r = org.shape[0]
    # Data-dependent zero: scalar tmin/tmax broadcasts must inherit the
    # rays' device-varying type under shard_map (zeros_like is a constant
    # fill and does NOT — the traversal loop carry would be typed
    # replicated-in / varying-out, a shard_map error).
    vary = (org[:, 0] + d[:, 0]) * 0.0  # org alone can be a constant
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,)) + vary
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,)) + vary
    ox, oy, oz = _components(org)
    dx, dy, dz = _components(d)
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    start = jnp.zeros_like(tmin, dtype=jnp.int32)
    if active is not None:
        start = jnp.where(active, start, -1)
    return (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmin, tmax, start)


def _octant_start(bvh, start, dx, dy, dz):
    """Pick the per-ray octant block when ordered links are available
    (front-to-back traversal; see accel/flatten.thread_bvh_octants)."""
    if bvh.nodes64o is None:
        return bvh.nodes64, start
    n = bvh.nodes64.shape[0]
    octant = (
        ((dx < 0.0).astype(jnp.int32) << 2)
        | ((dy < 0.0).astype(jnp.int32) << 1)
        | (dz < 0.0).astype(jnp.int32)
    )
    return bvh.nodes64o, jnp.where(start >= 0, octant * n, -1)


def _node_fetch(table, node, ox, oy, oz, ix, iy, iz, tmin, t_limit, active):
    """THE one gather per step (fused node+leaf record) + slab test.

    The gathered (R, 64) block is transposed ONCE to (64, R) so the ~40
    component reads below are contiguous row slices instead of cross-lane
    column extracts (measured 6x difference per step).
    Returns (rec_t, box_hit, hit_link, miss_link, leaf_id)."""
    rec_t = table[node].T
    tx0 = (rec_t[0] - ox) * ix
    tx1 = (rec_t[3] - ox) * ix
    ty0 = (rec_t[1] - oy) * iy
    ty1 = (rec_t[4] - oy) * iy
    tz0 = (rec_t[2] - oz) * iz
    tz1 = (rec_t[5] - oz) * iz
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
        jnp.minimum(tz0, tz1),
    )
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
        jnp.maximum(tz0, tz1),
    )
    box_hit = (t_near <= t_far) & (t_far >= tmin) & (t_near <= t_limit) & active
    return (
        rec_t,
        box_hit,
        _bits_to_i32(rec_t[6]),
        _bits_to_i32(rec_t[7]),
        _bits_to_i32(rec_t[8]),
    )



# Alpha-masked traversal on the streaming kernel: the kernel itself is
# gather-free (Mosaic cannot do per-lane indexing, so no in-kernel texture
# lookups); masked hits are resolved OUTSIDE by re-tracing past
# transparent intersections.  Round 4 made this EXACT and adaptive (the
# reference kernels are exact, core/mask.h): a data-dependent while_loop
# re-dispatches until no lane crossed a masked-out surface, and each
# re-trace goes through the SORTED kernel so resolved lanes compact into
# trailing zero-work blocks (cost scales with the count still tracing,
# not the batch).  MASK_MAX_ROUNDS is only a runaway guard (tmin strictly
# advances every round, so termination is already guaranteed; the guard
# caps a pathological epsilon stall).
# IMBA_MASK_MAX_ROUNDS override is for PROFILING ONLY (0 = time the
# prepass alone; the image is wrong whenever a lane still needed rounds).
# Defined below the _os import.

# Route incoherent (sort=True) stream dispatches through the pair-stream
# kernel (ops/pallas_pairs.py).  OFF by default after round-3 end-to-end
# measurement: the sort-only queue + exact saturation fallback reaches
# 1.9 Mrays/s scattered at 24k tris (vs 1.5 sorted-stream) on the
# microbench, but real frames LOSE — the 48k-tri PT frame regressed
# 2.6 -> 5.1 s/frame (bounce batches saturate the top-K cap, so most
# dispatches pay the pair pipeline AND the stream fallback).  The
# honest summary (docs/traversal.md): the queue rebuild made pairs
# 2.2-2.6x faster than round 2, but exactness costs more than the
# zero-divergence kernel saves at current saturation rates.
# Env override for experiments: IMBA_USE_PAIRS=1.
import os as _os

MASK_MAX_ROUNDS = int(_os.environ.get("IMBA_MASK_MAX_ROUNDS", "4096"))

USE_PAIRS = _os.environ.get("IMBA_USE_PAIRS", "0") == "1"

# Below this super-chunk count the block-stream kernel's divergence is
# bounded by the tiny candidate set and the pair queue's sorts cost more
# than they save (cornell_specular, S=3: sorted-stream VCM no-merge
# frame ~1.5 s vs pairs ~1.83 s).
PAIRS_MIN_SUPERCHUNKS = 8


def _vmem_sort() -> bool:
    """Sort incoherent vmem-mode dispatches (read at trace time).
    Measured on cornell_specular 1024² (results/r5_qrow_split.txt):
    scattered closest 22.2 ms vs coherent 6.6 at 256k lanes; the sort +
    two permutation gathers cost ~2-3 ms.  IMBA_VMEM_SORT=0 disables."""
    return _os.environ.get("IMBA_VMEM_SORT", "1") != "0"


def _inst(bvh):
    """Two-level instancing metadata for the streaming kernel (or None)."""
    if bvh.mode == "stream2":
        return (bvh.tile_idx, bvh.inst_of, bvh.itab)
    return None


def _recenter(bvh, org):
    """Shift ray origins into the tiles' recentred frame (pallas_stream
    precision contract; zero offset for "stream2")."""
    if bvh.center is None:
        return org
    return org - bvh.center[None, :]


def _closest_hit_masked(bvh, org, d, tmin, tmax, alpha_fn, active,
                        hit_fn=None, sort=False):
    """Closest hit with transparency masks via iterative re-tracing.

    Exact (reference: core/mask.h, the *_masked kernel family in
    ray_queue.h:254-341): a while_loop keeps re-dispatching past
    masked-out intersections until every lane lands on an opaque hit or
    a miss.  Re-traces use the SORTED stream dispatch: lanes not
    re-tracing carry the max sort key and compact into trailing
    zero-work blocks (pallas_stream.sort_keys), so a round touching 2%
    of lanes costs ~2% of a full dispatch plus the sort machinery.

    Round 4: non-instanced stream scenes route through the K-nearest-hit
    kernel (ops/pallas_khit.py) — each dispatch returns the 4 nearest
    hits and the XLA side alpha-tests them together, so one dispatch
    resolves up to 4 stacked masked layers (the one-layer-per-round
    scheme measured 5.9x opaque cost on the leaf canopy,
    results/bench_masked.csv).  IMBA_MASK_KHIT=0 restores the old path."""
    from ..ops.pallas_stream import closest_hit_sorted, closest_hit_stream

    if (hit_fn is None and _inst(bvh) is None
            and _os.environ.get("IMBA_MASK_KHIT", "1") != "0"):
        return _closest_hit_masked_khit(bvh, org, d, tmin, tmax, alpha_fn,
                                        active)
    if hit_fn is None:
        first_fn = closest_hit_sorted if sort else closest_hit_stream
        retr_fn = closest_hit_sorted
    else:
        first_fn = retr_fn = hit_fn  # vmem mode: no block compaction
    org = _recenter(bvh, org)
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    act = (
        jnp.ones((num_r,), jnp.bool_) if active is None else active
    )
    inst = _inst(bvh)
    hit = first_fn(bvh.sbox, bvh.tiles, org, d, tmin, tmax,
                   active=act, inst=inst)

    def _retrace_mask(hit):
        got = act & (hit.prim_id >= 0)
        opaque = alpha_fn(jnp.maximum(hit.prim_id, 0), hit.u, hit.v)
        return got & ~opaque

    def cond(st):
        k, _, retrace = st
        return jnp.any(retrace) & (k < MASK_MAX_ROUNDS)

    def body(st):
        k, hit, retrace = st
        new_tmin = hit.t + 1e-3 * jnp.maximum(hit.t, 1e-3)
        h2 = retr_fn(bvh.sbox, bvh.tiles, org, d,
                     jnp.where(retrace, new_tmin, tmin), tmax,
                     active=retrace, inst=inst)
        hit = Hit(
            t=jnp.where(retrace, h2.t, hit.t),
            prim_id=jnp.where(retrace, h2.prim_id, hit.prim_id),
            u=jnp.where(retrace, h2.u, hit.u),
            v=jnp.where(retrace, h2.v, hit.v),
        )
        return k + 1, hit, retrace & _retrace_mask(hit)

    _, hit, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), hit, _retrace_mask(hit)))
    return hit


def _closest_hit_masked_khit(bvh, org, d, tmin, tmax, alpha_fn, active):
    """Masked closest hit on the K-nearest-hit kernel: each while round
    fetches the 4 nearest hits for the lanes still unresolved and
    alpha-tests them together; a lane re-traces only when all 4 were
    valid AND masked out (more surfaces may lie beyond the 4th).  Exact:
    the kernel's K-set is gap-free (per-column slot superset argument,
    ops/pallas_khit.py), so no surface between returned hits can be
    skipped.

    IMBA_MASK_PREPASS=1 prepends a plain single-hit dispatch over all
    lanes so only lanes whose first hit alpha-tests transparent enter
    the khit loop.  Default OFF since chain21: it won under the OLD
    six-gather alpha chain (chains 14/16, 4286 vs 4576 ms) but LOSES
    ~700 ms/frame under the narrow mask record (canopy khit-only 2825
    vs prepass 3522 — the cheap alpha test removed what the prepass
    was saving, leaving its extra full-batch dispatch).  Two further
    measured negatives recorded for whoever re-opens this (chain24,
    results/bench_masked_prepass*.csv): hoisting the Morton sort out
    of the while_loop regresses ~+720 ms under EITHER prepass setting
    — the per-round re-sort is what re-compacts the shrinking active
    set into fewer blocks, worth far more than the sort machinery it
    costs — and K=8 compile-fails on scoped VMEM (18.02M > 16M) at
    BLK=512."""
    from ..ops.pallas_khit import K, khit_sorted
    from ..ops.pallas_stream import closest_hit_sorted

    org = _recenter(bvh, org)
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    act = jnp.ones((num_r,), jnp.bool_) if active is None else active

    hit0 = Hit(t=jnp.full((num_r,), BIG), prim_id=jnp.full((num_r,), -1,
                                                           jnp.int32),
               u=jnp.zeros((num_r,)), v=jnp.zeros((num_r,)))

    if _os.environ.get("IMBA_MASK_PREPASS", "0") == "1":
        h1 = closest_hit_sorted(bvh.sbox, bvh.tiles, org, d, tmin, tmax,
                                active=act, inst=None)
        got = act & (h1.prim_id >= 0)
        opaque = alpha_fn(jnp.maximum(h1.prim_id, 0), h1.u, h1.v)
        resolved = got & opaque
        hit0 = Hit(
            t=jnp.where(resolved, h1.t, hit0.t),
            prim_id=jnp.where(resolved, h1.prim_id, hit0.prim_id),
            u=jnp.where(resolved, h1.u, hit0.u),
            v=jnp.where(resolved, h1.v, hit0.v),
        )
        need = got & ~opaque
        tmin = jnp.where(need, h1.t + 1e-3 * jnp.maximum(h1.t, 1e-3), tmin)
        act = need

    def cond(st):
        k, need, _, _ = st
        return jnp.any(need) & (k < MASK_MAX_ROUNDS)

    def body(st):
        k, need, tcur, hit = st
        t4, u4, v4, id4 = khit_sorted(
            bvh.sbox, bvh.tiles, org, d, jnp.where(need, tcur, tmin), tmax,
            active=need)
        ht, hu, hv, hid = hit.t, hit.u, hit.v, hit.prim_id
        found = jnp.zeros_like(need)
        for j in range(K):
            vj = id4[:, j] >= 0
            op = alpha_fn(jnp.maximum(id4[:, j], 0), u4[:, j], v4[:, j])
            take = need & ~found & vj & op
            ht = jnp.where(take, t4[:, j], ht)
            hu = jnp.where(take, u4[:, j], hu)
            hv = jnp.where(take, v4[:, j], hv)
            hid = jnp.where(take, id4[:, j], hid)
            found = found | take
        saturated = id4[:, K - 1] >= 0
        exhausted = need & ~found & saturated
        miss = need & ~found & ~saturated
        ht = jnp.where(miss, BIG, ht)
        hid = jnp.where(miss, -1, hid)
        new_tmin = t4[:, K - 1] + 1e-3 * jnp.maximum(t4[:, K - 1], 1e-3)
        return (k + 1, exhausted, jnp.where(exhausted, new_tmin, tcur),
                Hit(t=ht, prim_id=hid, u=hu, v=hv))

    static_rounds = int(_os.environ.get("IMBA_MASK_STATIC_ROUNDS", "0"))
    if static_rounds > 0:
        # PROFILING ONLY (inexact beyond static_rounds*K mask layers):
        # replace the data-dependent while with a fixed-trip fori so the
        # frame-scope cost of the while *structure* (fusion barrier /
        # scheduling, chains 19/20's unexplained +2207 ms carry) can be
        # separated from the khit dispatches themselves.
        st = (jnp.int32(0), act, tmin, hit0)
        st = jax.lax.fori_loop(0, static_rounds, lambda _, s: body(s), st)
        return st[3]
    if _os.environ.get("IMBA_MASK_HYBRID", "0") == "1":
        # Hybrid schedule (exact): ONE static khit round, then the
        # while handles saturated leftovers.  Measured NEUTRAL on the
        # canopy (2431 vs 2469 ms, chain59) — the masked carry is the
        # while ITERATIONS for saturated lanes, not the while's
        # presence (chain52: static-1-only, which SKIPS those lanes
        # inexactly, hits opaque parity 1639 vs 2477) — and the extra
        # static call pushed the khit kernel's scoped VMEM 4 KiB over
        # the 16 MiB limit on the 1080p masked compile (chain56 crash).
        # Default OFF; the round-6 lever is a smaller dedicated khit
        # block so K can rise and the saturated tail shrinks.
        st = body((jnp.int32(0), act, tmin, hit0))
        _, _, _, hit = jax.lax.while_loop(cond, body, st)
        return hit
    _, _, _, hit = jax.lax.while_loop(
        cond, body, (jnp.int32(0), act, tmin, hit0))
    return hit


def _dense2_max() -> int:
    """IMBA_DENSE2_MAX=<tris>: route vmem-mode dispatches with at most
    this many packed triangles through the broadcast-dense formulation
    (0 = off).  Trace-time read (bench-chain A/B convention)."""
    try:
        return int(_os.environ.get("IMBA_DENSE2_MAX", "0"))
    except ValueError:
        return 0


def _dense_bcast(bvh, org, d, tmin, tmax, active, want_hit):
    """Broadcast-dense exhaustive Möller-Trumbore: ONE (R, T) elementwise
    chain that XLA fuses into the reduction (occlusion: any; closest:
    argmin over the masked t plane + one wide-record gather and a winner
    recompute).

    Occupies the gap between the unrolled dense mode (compile size O(T):
    the ~1k-tri unroll blows axon's 2 GiB executable-serialization cap)
    and the vmem Pallas kernel (a fusion barrier with per-dispatch sort
    machinery, ~22 ms at 262k lanes on the 2188-tri cornell VCM family).
    Compile size here is O(1) in T, there is no Pallas call and no sort;
    the (R, T) product is ~25 VPU ops/pair — at 2k tris x 262k rays
    that is ~14 Gops, well under the machinery it replaces.  Masked
    scenes keep the vmem route (alpha_fn would need per-pair texture
    gathers)."""
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    act = jnp.ones((num_r,), jnp.bool_) if active is None else active

    # (R, 1) ray components x (1, T) triangle components.
    ox, oy, oz = org[:, 0:1], org[:, 1:2], org[:, 2:3]
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    v0x, v0y, v0z = (bvh.tri_v0[None, :, 0], bvh.tri_v0[None, :, 1],
                     bvh.tri_v0[None, :, 2])
    e1x, e1y, e1z = (bvh.tri_e1[None, :, 0], bvh.tri_e1[None, :, 1],
                     bvh.tri_e1[None, :, 2])
    e2x, e2y, e2z = (bvh.tri_e2[None, :, 0], bvh.tri_e2[None, :, 1],
                     bvh.tri_e2[None, :, 2])
    tid = bvh.tri_id[None, :]

    def mt(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, tid, lo, hi):
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        ok = ((inv_det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
              & (tt > lo) & (tt < hi) & (tid >= 0))
        return tt, u, v, ok

    tt, _, _, ok = mt(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z, tid,
                      tmin[:, None], tmax[:, None])
    ok = ok & act[:, None]
    if not want_hit:
        return jnp.any(ok, axis=1)

    big = jnp.float32(BIG)
    best = jnp.argmin(jnp.where(ok, tt, big), axis=1)         # (R,)
    # One wide-record gather of the winning triangle, then recompute —
    # the (R, T) planes above exist only inside the fused reduction.
    rec = jnp.concatenate([
        bvh.tri_v0, bvh.tri_e1, bvh.tri_e2,
        bvh.tri_id.astype(jnp.float32)[:, None],
    ], axis=1)                                                # (T, 10)
    g = rec[best].T                                           # (10, R)
    tid_w = g[9].astype(jnp.int32)[:, None]
    tt_w, u_w, v_w, ok_w = mt(
        g[0][:, None], g[1][:, None], g[2][:, None],
        g[3][:, None], g[4][:, None], g[5][:, None],
        g[6][:, None], g[7][:, None], g[8][:, None],
        tid_w, tmin[:, None], tmax[:, None])
    valid = (ok_w[:, 0] & act)
    return Hit(
        t=jnp.where(valid, tt_w[:, 0], big),
        prim_id=jnp.where(valid, tid_w[:, 0], -1),
        u=jnp.where(valid, u_w[:, 0], 0.0),
        v=jnp.where(valid, v_w[:, 0], 0.0),
    )


def _dense_chunked(bvh, org, d, tmin, tmax, active, alpha_fn, want_hit,
                   chunk: int = 32):
    """Exhaustive all-triangles test as a fori_loop over triangle chunks.

    Same zero-gather arithmetic as the unrolled dense mode, but the loop
    body covers `chunk` triangles (sliced contiguously — no gathers), so
    compile size is O(chunk) instead of O(num_tris).  Extends the dense
    regime to mid scenes (2-4k tris, e.g. the cornell VCM family) where
    exhaustive VPU work (~25 ops per ray-tri pair) still beats ANY
    hierarchy's per-dispatch machinery: sorts, candidate lists and
    kernel launches all cost more than brute force at this size.
    The body is large enough (chunk x R lanes) to amortise XLA's
    per-iteration loop overhead (the known ~100x penalty applies to
    SMALL bodies, scripts/profile_loop_gather.py)."""
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    ox, oy, oz = _components(org)
    dx, dy, dz = _components(d)
    act = (jnp.ones((num_r,), jnp.bool_) if active is None else active)

    num_p = bvh.tri_v0.shape[0]
    pad = (-num_p) % chunk
    v0 = jnp.pad(bvh.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(bvh.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(bvh.tri_e2, ((0, pad), (0, 0)))
    tid_arr = jnp.pad(bvh.tri_id, (0, pad), constant_values=-1)

    big = jnp.float32(BIG)
    init = (
        tmax,                                  # best t / unused for occl
        jnp.zeros((num_r,), jnp.int32) - 1,    # best id
        jnp.zeros((num_r,), jnp.float32),      # u
        jnp.zeros((num_r,), jnp.float32),      # v
        jnp.zeros((num_r,), jnp.bool_),        # occluded
    )

    def body(i, st):
        best_t, best_id, best_u, best_v, occluded = st
        base = i * chunk
        vc = jax.lax.dynamic_slice(v0, (base, 0), (chunk, 3))
        e1c = jax.lax.dynamic_slice(e1, (base, 0), (chunk, 3))
        e2c = jax.lax.dynamic_slice(e2, (base, 0), (chunk, 3))
        tic = jax.lax.dynamic_slice(tid_arr, (base,), (chunk,))
        for j in range(chunk):
            v0x, v0y, v0z = vc[j, 0], vc[j, 1], vc[j, 2]
            e1x, e1y, e1z = e1c[j, 0], e1c[j, 1], e1c[j, 2]
            e2x, e2y, e2z = e2c[j, 0], e2c[j, 1], e2c[j, 2]
            tid = tic[j]

            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            limit = best_t if want_hit else tmax
            ok = (
                (inv_det != 0.0)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (tt > tmin)
                & (tt < limit)
                & act
                & (tid >= 0)
            )
            if alpha_fn is not None:
                prim_b = jnp.broadcast_to(tid, ok.shape)
                ok = ok & alpha_fn(jnp.maximum(prim_b, 0), u, v)
            if want_hit:
                best_t = jnp.where(ok, tt, best_t)
                best_id = jnp.where(ok, tid, best_id)
                best_u = jnp.where(ok, u, best_u)
                best_v = jnp.where(ok, v, best_v)
            else:
                occluded = occluded | ok
        return best_t, best_id, best_u, best_v, occluded

    best_t, best_id, best_u, best_v, occluded = jax.lax.fori_loop(
        0, (num_p + pad) // chunk, body, init)
    if want_hit:
        best_t = jnp.where(best_id >= 0, best_t, big)
        return Hit(t=best_t, prim_id=best_id, u=best_u, v=best_v)
    return occluded


def _dense_loop(bvh, org, d, tmin, tmax, active, alpha_fn, want_hit):
    """Statically unrolled all-triangles test (see module docstring)."""
    # NB: scalar tmin/tmax stay CONSTANTS here (no `vary` term): the
    # dense path has no lax loop, so the shard_map carry-typing fix in
    # _prep is unnecessary — and materialising them as runtime tensors
    # measurably slows the fused unrolled graph (595 vs ~212 ms/frame
    # for the 1024 cornell PT megastep).
    num_r = org.shape[0]
    tmin = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (num_r,))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (num_r,))
    ox, oy, oz = _components(org)
    dx, dy, dz = _components(d)
    start = jnp.zeros((num_r,), jnp.int32)
    if active is not None:
        start = jnp.where(active, start, -1)
    act = start >= 0
    num_p = bvh.tri_v0.shape[0]
    v0 = bvh.tri_v0
    e1 = bvh.tri_e1
    e2 = bvh.tri_e2
    tid_arr = bvh.tri_id

    best_t = tmax
    best_id = jnp.zeros_like(start) - 1
    best_u = jnp.zeros_like(tmin)
    best_v = jnp.zeros_like(tmin)
    occluded = jnp.zeros_like(act)

    for t_idx in range(num_p):
        v0x, v0y, v0z = v0[t_idx, 0], v0[t_idx, 1], v0[t_idx, 2]
        e1x, e1y, e1z = e1[t_idx, 0], e1[t_idx, 1], e1[t_idx, 2]
        e2x, e2y, e2z = e2[t_idx, 0], e2[t_idx, 1], e2[t_idx, 2]

        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        limit = best_t if want_hit else tmax
        ok = (
            (inv_det != 0.0)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt > tmin)
            & (tt < limit)
            & act
        )
        if alpha_fn is not None:
            prim_b = jnp.broadcast_to(tid_arr[t_idx], ok.shape)
            ok = ok & alpha_fn(jnp.maximum(prim_b, 0), u, v)
        ok = ok & (tid_arr[t_idx] >= 0)
        if want_hit:
            best_t = jnp.where(ok, tt, best_t)
            best_id = jnp.where(ok, tid_arr[t_idx], best_id)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
        else:
            occluded = occluded | ok

    if want_hit:
        best_t = jnp.where(best_id >= 0, best_t, BIG)
        return Hit(t=best_t, prim_id=best_id, u=best_u, v=best_v)
    return occluded


@partial(jax.jit, static_argnames=("alpha_fn", "max_steps", "sort"))
def closest_hit(
    bvh: DeviceBvh,
    org: jnp.ndarray,
    d: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    alpha_fn: Optional[Callable] = None,
    active: Optional[jnp.ndarray] = None,
    max_steps: int = 0,
    sort: bool = False,
) -> Hit:
    """Closest-hit traversal for a batch of rays.

    org/d: (R, 3); tmin/tmax: scalar or (R,).  Lanes where `active` is
    False skip traversal entirely (start at the terminal node).
    `sort=True` (stream modes) sorts the batch by origin-Morton +
    direction octant before dispatch — incoherent bounce/shadow batches
    get coherent per-block candidate lists, and dead lanes compact into
    zero-work blocks (the reference's RayQueue::compact analogue).

    The loop is a *static-trip* fori_loop: a data-dependent while-loop
    condition would synchronise with the host every iteration (measured
    ~33 ms per iteration through the axon tunnel).  `max_steps` defaults
    to the node count (the exact worst case for threaded traversal);
    callers with deep scenes can cap it lower and accept a bounded
    false-miss probability (validated in tests).
    """
    if bvh.mode == "dense" or max_steps == -1:
        return _dense_loop(bvh, org, d, tmin, tmax, active, alpha_fn, True)
    if bvh.mode == "densel":
        return _dense_chunked(bvh, org, d, tmin, tmax, active, alpha_fn,
                              True)
    if bvh.mode == "vmem":
        from ..ops.pallas_vmem import closest_hit_vmem

        if alpha_fn is None:
            if (bvh.tri_v0 is not None
                    and 0 < bvh.tri_v0.shape[0] <= _dense2_max()):
                return _dense_bcast(bvh, org, d, tmin, tmax, active,
                                    want_hit=True)
            if sort and _vmem_sort():
                # Octant-major pre-sort (pallas_vmem._sorted_vmem_call:
                # the kernel's per-block cost scales with the union of
                # MT groups its lanes touch; scattered batches pay 3.4x
                # coherent ones without it).  IMBA_VMEM_SORT=0 restores
                # the direct dispatch.
                from ..ops.pallas_vmem import closest_hit_vmem_sorted

                return closest_hit_vmem_sorted(bvh.sbox, bvh.tiles,
                                               _recenter(bvh, org), d,
                                               tmin, tmax, active=active)
            return closest_hit_vmem(bvh.sbox, bvh.tiles,
                                    _recenter(bvh, org), d, tmin, tmax,
                                    active=active)
        return _closest_hit_masked(bvh, org, d, tmin, tmax, alpha_fn,
                                   active, hit_fn=closest_hit_vmem,
                                   sort=sort)
    if bvh.mode in ("stream", "stream2"):
        from ..ops.pallas_pairs import closest_hit_pairs
        from ..ops.pallas_stream import closest_hit_stream

        if alpha_fn is None:
            # Incoherent dispatches (bounce/shadow batches): the sorted
            # pair queue for scenes with enough super-chunks, the
            # Morton-sorted stream kernel otherwise (see
            # PAIRS_MIN_SUPERCHUNKS).
            use_pairs = (USE_PAIRS
                         and bvh.sbox.shape[0] >= PAIRS_MIN_SUPERCHUNKS)
            if sort and use_pairs:
                fn = closest_hit_pairs
            elif sort:
                from ..ops.pallas_stream import closest_hit_sorted

                fn = closest_hit_sorted
            else:
                fn = closest_hit_stream
            return fn(bvh.sbox, bvh.tiles, _recenter(bvh, org), d, tmin,
                      tmax, active=active, inst=_inst(bvh))
        return _closest_hit_masked(bvh, org, d, tmin, tmax, alpha_fn, active,
                                   sort=sort)
    (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmin, tmax, start) = _prep(
        org, d, tmin, tmax, active
    )
    table, start = _octant_start(bvh, start, dx, dy, dz)
    if max_steps <= 0:
        max_steps = bvh.nodes64.shape[0]
    init = (
        start,                               # current node
        tmax,                                # best t (doubles as ray tmax)
        jnp.zeros_like(start) - 1,           # best primitive id
        jnp.zeros_like(tmin),                # u
        jnp.zeros_like(tmin),                # v
    )

    def body(_, state):
        node_raw, best_t, best_id, best_u, best_v = state
        act = node_raw >= 0
        node = jnp.maximum(node_raw, 0)
        rec_t, box_hit, hit_link, miss_link, leaf_id = _node_fetch(
            table, node, ox, oy, oz, ix, iy, iz, tmin, best_t, act
        )
        do_leaf = box_hit & (leaf_id >= 0)
        leaf_t = rec_t[12:60]  # embedded 4-triangle packet, no second gather
        for j in range(LEAF_WIDTH):
            t, u, v, tid, ok = _mt_packet(
                leaf_t, j, ox, oy, oz, dx, dy, dz, tmin, best_t, alpha_fn
            )
            closer = ok & do_leaf
            best_t = jnp.where(closer, t, best_t)
            best_id = jnp.where(closer, tid, best_id)
            best_u = jnp.where(closer, u, best_u)
            best_v = jnp.where(closer, v, best_v)

        nxt = jnp.where(box_hit, hit_link, miss_link)
        node_raw = jnp.where(act, nxt, -1)
        return node_raw, best_t, best_id, best_u, best_v

    _, t, prim_id, u, v = jax.lax.fori_loop(0, max_steps, body, init)
    t = jnp.where(prim_id >= 0, t, BIG)
    return Hit(t=t, prim_id=prim_id, u=u, v=v)


@partial(jax.jit, static_argnames=("alpha_fn", "max_steps", "sort"))
def any_hit(
    bvh: DeviceBvh,
    org: jnp.ndarray,
    d: jnp.ndarray,
    tmin: jnp.ndarray,
    tmax: jnp.ndarray,
    alpha_fn: Optional[Callable] = None,
    active: Optional[jnp.ndarray] = None,
    max_steps: int = 0,
    sort: bool = False,
) -> jnp.ndarray:
    """Occlusion query: True where *any* primitive blocks (tmin, tmax).

    Early-outs per lane the moment an occluder is found (the reference's
    `occluded_*` kernels, ray_queue.h:296-343).
    """
    if bvh.mode == "dense" or max_steps == -1:
        return _dense_loop(bvh, org, d, tmin, tmax, active, alpha_fn, False)
    if bvh.mode == "densel":
        return _dense_chunked(bvh, org, d, tmin, tmax, active, alpha_fn,
                              False)
    if bvh.mode == "vmem":
        from ..ops.pallas_vmem import any_hit_vmem, closest_hit_vmem

        if alpha_fn is None:
            if (bvh.tri_v0 is not None
                    and 0 < bvh.tri_v0.shape[0] <= _dense2_max()):
                return _dense_bcast(bvh, org, d, tmin, tmax, active,
                                    want_hit=False)
            if sort and _vmem_sort():
                from ..ops.pallas_vmem import any_hit_vmem_sorted

                return any_hit_vmem_sorted(bvh.sbox, bvh.tiles,
                                           _recenter(bvh, org), d, tmin,
                                           tmax, active=active)
            return any_hit_vmem(bvh.sbox, bvh.tiles, _recenter(bvh, org),
                                d, tmin, tmax, active=active)
        hit = _closest_hit_masked(bvh, org, d, tmin, tmax, alpha_fn,
                                  active, hit_fn=closest_hit_vmem,
                                  sort=sort)
        return hit.prim_id >= 0
    if bvh.mode in ("stream", "stream2"):
        from ..ops.pallas_pairs import any_hit_pairs
        from ..ops.pallas_stream import any_hit_stream

        if alpha_fn is None:
            use_pairs = (USE_PAIRS
                         and bvh.sbox.shape[0] >= PAIRS_MIN_SUPERCHUNKS)
            if sort and use_pairs:
                fn = any_hit_pairs
            elif sort:
                from ..ops.pallas_stream import any_hit_sorted

                fn = any_hit_sorted
            else:
                fn = any_hit_stream
            return fn(bvh.sbox, bvh.tiles, _recenter(bvh, org),
                      d, tmin, tmax, active=active, inst=_inst(bvh))
        hit = _closest_hit_masked(bvh, org, d, tmin, tmax, alpha_fn, active,
                                  sort=sort)
        return hit.prim_id >= 0
    (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmin, tmax, start) = _prep(
        org, d, tmin, tmax, active
    )
    table, start = _octant_start(bvh, start, dx, dy, dz)
    if max_steps <= 0:
        max_steps = bvh.nodes64.shape[0]
    init = (start, jnp.zeros_like(tmin, dtype=jnp.bool_))

    def body(_, state):
        node_raw, occluded = state
        act = node_raw >= 0
        node = jnp.maximum(node_raw, 0)
        rec_t, box_hit, hit_link, miss_link, leaf_id = _node_fetch(
            table, node, ox, oy, oz, ix, iy, iz, tmin, tmax, act
        )
        do_leaf = box_hit & (leaf_id >= 0)
        leaf_t = rec_t[12:60]
        found = jnp.zeros_like(act)
        for j in range(LEAF_WIDTH):
            _, _, _, _, ok = _mt_packet(
                leaf_t, j, ox, oy, oz, dx, dy, dz, tmin, tmax, alpha_fn
            )
            found = found | (ok & do_leaf)
        occluded = occluded | found

        nxt = jnp.where(box_hit, hit_link, miss_link)
        node_raw = jnp.where(act & ~found, nxt, -1)
        return node_raw, occluded

    _, occluded = jax.lax.fori_loop(0, max_steps, body, init)
    return occluded
