"""Slope-based device-time measurement: run K dependent iterations inside
one jit call; per-iteration cost = (t(K2) - t(K1)) / (K2 - K1).  Immune to
RPC latency, dispatch floors, caching and constant folding."""

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/imbatracer_jax_cache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

K1, K2 = 4, 40


def slope(name, make_fn, *args, unit_ops=1.0):
    f1 = jax.jit(make_fn(K1))
    f2 = jax.jit(make_fn(K2))
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f2(*args))

    def timed(f):
        t0 = time.time()
        for _ in range(3):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / 3

    t1 = timed(f1)
    t2 = timed(f2)
    per = (t2 - t1) / (K2 - K1)
    print(f"{name:48s} {per*1000:9.3f} ms/iter  ({unit_ops/max(per,1e-12)/1e9:7.1f} Gop/s)")
    return per


R = 1 << 20
rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.rand(R), jnp.float32)
x2d = jnp.asarray(rs.rand(R // 128, 128), jnp.float32)
x2dw = jnp.asarray(rs.rand(512, 2048), jnp.float32)


def ew_chain(shape_arr):
    def make(K):
        def run(x):
            def body(i, x):
                # ~10 elementwise ops, data-dependent across iterations
                return x * 1.0001 + jnp.abs(x) * 0.5 - jnp.minimum(x, 0.3) * 0.1 + x * x * 1e-6
            return jax.lax.fori_loop(0, K, body, x).sum()
        return run
    return make


slope("10-op elementwise (1M,) f32", ew_chain(x0), x0, unit_ops=10 * R)
slope("10-op elementwise (8192,128) f32", ew_chain(x2d), x2d, unit_ops=10 * R)
slope("10-op elementwise (512,2048) f32", ew_chain(x2dw), x2dw, unit_ops=10 * R)

xbf = x0.astype(jnp.bfloat16)
slope("10-op elementwise (1M,) bf16", ew_chain(xbf), xbf, unit_ops=10 * R)

# Divide + select heavy (traversal-like mix)
def divsel(K):
    def run(x):
        def body(i, x):
            y = 1.0 / jnp.maximum(jnp.abs(x), 1e-6)
            return jnp.where(y > 1.0, x * 0.999, y)
        return jax.lax.fori_loop(0, K, body, x).sum()
    return run


slope("div+select (1M,)", divsel, x0, unit_ops=4 * R)

# Wide gather in loop (node fetch analogue)
N = 8192
tab16 = jnp.asarray(rs.rand(N, 16), jnp.float32)
tab48 = jnp.asarray(rs.rand(N, 48), jnp.float32)
idx = jnp.asarray(rs.randint(0, N, R), jnp.int32)


def gather_loop(tab, w):
    def make(K):
        def run(i0):
            def body(k, c):
                s, j = c
                rec = tab[j]
                j = (j + jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)) & (N - 1)
                return s + rec[:, 0], j
            s, _ = jax.lax.fori_loop(0, K, body, (jnp.zeros((R,)), i0))
            return s.sum()
        return run
    return make


slope("gather (8192,16) in loop", gather_loop(tab16, 16), idx, unit_ops=R)
slope("gather (8192,48) in loop", gather_loop(tab48, 48), idx, unit_ops=R)

# Small table (cornell-sized)
tab_small = jnp.asarray(rs.rand(32, 16), jnp.float32)
idx_small = jnp.asarray(rs.randint(0, 32, R), jnp.int32)


def gather_small(K):
    def run(i0):
        def body(k, c):
            s, j = c
            rec = tab_small[j]
            j = (j + jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)) & 31
            return s + rec[:, 0], j
        s, _ = jax.lax.fori_loop(0, K, body, (jnp.zeros((R,)), i0))
        return s.sum()
    return run


slope("gather (32,16) in loop", gather_small, idx_small, unit_ops=R)

# Full traversal step cost (the real body)
from imbatracer_tpu.scene.procedural import make_cornell_scene
from imbatracer_tpu.render.traverse import _node_fetch, _mt_packet, _prep

scene, meta = make_cornell_scene()
bvh = scene.bvh
org = jnp.asarray(rs.rand(R, 3) * 2 - 1, jnp.float32)
d = jnp.asarray(rs.randn(R, 3), jnp.float32)


def trav_step(K):
    def run(org, d):
        (ox, oy, oz, dx, dy, dz, ix, iy, iz, tmin, tmax, start) = _prep(
            org, d, 0.0, 1e30, None
        )

        def body(k, state):
            node_raw, best_t = state
            act = node_raw >= 0
            node = jnp.maximum(node_raw, 0)
            box_hit, hit_link, miss_link, leaf_id = _node_fetch(
                bvh, node, ox, oy, oz, ix, iy, iz, tmin, best_t, act
            )
            do_leaf = box_hit & (leaf_id >= 0)
            leaf = bvh.leaf48[jnp.where(do_leaf, leaf_id, 0)]
            for j in range(4):
                t, u, v, tid, ok = _mt_packet(
                    leaf, j, ox, oy, oz, dx, dy, dz, tmin, best_t, None
                )
                best_t = jnp.where(ok & do_leaf, t, best_t)
            nxt = jnp.where(box_hit, hit_link, miss_link)
            return jnp.where(act, nxt, jnp.where(k < K, 0, -1)), best_t

        n, t = jax.lax.fori_loop(0, K, body, (start, tmax))
        return t.sum()
    return run


slope("FULL traversal step (cornell)", trav_step, org, d, unit_ops=R)
