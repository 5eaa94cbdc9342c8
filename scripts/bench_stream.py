"""Validate + benchmark the HBM-streamed traversal kernel on TPU.

1. correctness: stream vs dense brute force (small scene), stream vs the
   VMEM-chunked kernel (mid scene)
2. throughput: closest_hit / any_hit Mrays/s on a ~262k-tri procedural
   scene, primary (coherent) and bounce-like (hemisphere) rays, slope
   method (K iterations inside one jit).
"""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from imbatracer_tpu.accel.builder import build_bvh
from imbatracer_tpu.accel.flatten import thread_bvh
from imbatracer_tpu.ops import pallas_stream as ps
from imbatracer_tpu.accel.device import DeviceBvh


def boxes_scene(num_boxes, seed=0):
    from imbatracer_tpu.scene.procedural import _add_box, _quad

    rs = np.random.RandomState(seed)
    tris = []
    S = 40.0
    for t in _quad((-S, 0, S), (S, 0, S), (S, 0, -S), (-S, 0, -S)):
        tris.append((*t, 0))
    for _ in range(num_boxes):
        c = (rs.uniform(-S, S), rs.uniform(0.2, 12.0), rs.uniform(-S, S))
        sz = tuple(rs.uniform(0.2, 1.5, 3))
        _add_box(tris, center=c, size=sz, angle_deg=rs.uniform(0, 360), mat=0)
    v0 = np.asarray([t[0] for t in tris], np.float32)
    v1 = np.asarray([t[1] for t in tris], np.float32)
    v2 = np.asarray([t[2] for t in tris], np.float32)
    lo = np.minimum(np.minimum(v0, v1), v2)
    hi = np.maximum(np.maximum(v0, v1), v2)
    nodes = build_bvh(lo, hi)
    tb = thread_bvh(nodes, v0, v1, v2)
    return tb


def primary_rays(n, origin=(0.0, 14.0, 55.0), seed=1, tile=0):
    rs = np.random.RandomState(seed)
    side = int(np.sqrt(n))
    idx = np.arange(n)
    if tile:
        # Reorder pixels into (tile x tile*2) rectangles so each 512-ray
        # kernel block is a compact image tile, not two full rows.
        px, py = idx % side, idx // side
        tw, th = tile * 2, tile
        order = np.lexsort((px % tw, py % th, px // tw, py // th))
        idx = idx[order]
    xs = (idx % side) / side - 0.5
    ys = (idx // side) / side - 0.5
    d = np.stack([xs * 1.4, ys * 0.9 - 0.25, -np.ones(len(xs))], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    org = np.broadcast_to(np.asarray(origin, np.float32), (n, 3)).copy()
    return jnp.asarray(org), jnp.asarray(d)


def scattered_rays(n, seed=2):
    rs = np.random.RandomState(seed)
    org = np.stack(
        [rs.uniform(-38, 38, n), rs.uniform(0.5, 11, n), rs.uniform(-38, 38, n)],
        -1,
    ).astype(np.float32)
    d = rs.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def check_correct():
    from imbatracer_tpu.render.traverse import Hit

    tb = boxes_scene(25)  # 302 tris
    sbox, tiles, center = ps.pack_stream_tiles(tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
    sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
    org0, d = scattered_rays(4096)
    org = org0 - center[None, :]
    BIG = ps.BIG

    from imbatracer_tpu.render.traverse import closest_hit, any_hit

    xbvh = DeviceBvh.from_threaded(tb, mode="xla")
    h_st = ps.closest_hit_stream(sboxj, tilesj, org, d, 0.0, BIG)
    h_ch = closest_hit(xbvh, org0, d, 0.0, BIG)
    bad = int(jnp.sum(h_st.prim_id != h_ch.prim_id))
    print(f"closest stream-vs-xla mismatches: {bad}/4096")
    assert bad == 0
    m = np.asarray(h_ch.prim_id >= 0)
    np.testing.assert_allclose(
        np.asarray(h_st.t)[m], np.asarray(h_ch.t)[m], rtol=1e-4
    )

    occ_st = ps.any_hit_stream(sboxj, tilesj, org, d, 0.0, jnp.full((4096,), 3.0))
    occ_ch = any_hit(xbvh, org0, d, 0.0, jnp.full((4096,), 3.0))
    bad = int(jnp.sum(occ_st != occ_ch))
    print(f"anyhit  stream-vs-xla mismatches: {bad}/4096")
    assert bad == 0

    # active-lane masking
    act = jnp.asarray(np.random.RandomState(3).rand(4096) < 0.7)
    h_a = ps.closest_hit_stream(sboxj, tilesj, org, d, 0.0, BIG, active=act)
    assert int(jnp.sum((h_a.prim_id >= 0) & ~act)) == 0
    bad = int(jnp.sum(jnp.where(act, h_a.prim_id != h_st.prim_id, False)))
    assert bad == 0
    print("active masking ok")


def bench(tb, n_rays, label, rays_fn, iters=24, sort=False, pairs=False):
    sbox, tiles, center = ps.pack_stream_tiles(tb.tri_v0, tb.tri_e1, tb.tri_e2, tb.tri_id)
    sboxj, tilesj = jnp.asarray(sbox), jnp.asarray(tiles)
    org, d = rays_fn(n_rays)
    org = org - center[None, :]
    if pairs:
        from imbatracer_tpu.ops.pallas_pairs import closest_hit_pairs
        hit_fn = closest_hit_pairs
    else:
        hit_fn = ps.closest_hit_sorted if sort else ps.closest_hit_stream

    def make(k):
        @jax.jit
        def run(org, d):
            def body(i, acc):
                h = hit_fn(
                    sboxj, tilesj, org + acc * 1e-30, d, 0.0, ps.BIG
                )
                return acc + jnp.tanh(jnp.sum(h.t * 1e-9))
            return jax.lax.fori_loop(0, k, body, 0.0)
        return run

    f1, f2 = make(4), make(4 + iters)
    jax.block_until_ready(f1(org, d)); jax.block_until_ready(f2(org, d))
    t0 = time.perf_counter(); jax.block_until_ready(f1(org, d))
    t1 = time.perf_counter(); jax.block_until_ready(f2(org, d))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    print(f"{label}: {per * 1e3:.2f} ms / {n_rays} rays -> "
          f"{n_rays / per / 1e6:.1f} Mrays/s", flush=True)
    return n_rays / per / 1e6


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    only = sys.argv[1] if len(sys.argv) > 1 else ""
    if not only:
        check_correct()

    sizes = [(2_000, "24k"), (22_000, "264k")]
    for nb, lbl in sizes:
        if only and only not in lbl:
            continue
        tb = boxes_scene(nb)
        nt = tb.tri_v0.shape[0]
        print(f"--- scene {lbl} tris ({nt} packed)", flush=True)
        # NB pairs variants run FIRST: the block-stream scattered entry
        # on the 264k scene can fault the device (under investigation)
        # and poisons the process for everything after it.
        for name, fn, kw in (
            ("primary pairs ", lambda n: primary_rays(n, tile=16),
             {"pairs": True}),
            ("scattered prs ", scattered_rays, {"pairs": True}),
            ("primary       ", primary_rays, {}),
            ("primary tiled ", lambda n: primary_rays(n, tile=16), {}),
            ("scattered     ", scattered_rays, {}),
            ("scattered sort", scattered_rays, {"sort": True}),
        ):
            try:
                bench(tb, 1 << 18, f"{lbl} {name}", fn, **kw)
            except Exception as e:
                print(f"{lbl} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
