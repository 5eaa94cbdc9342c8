"""Why are gathers slow inside XLA loops? Isolate loop structure effects."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:52s} {dt*1000:9.3f} ms")
    return dt


R = 1 << 20
N = 8192
STEPS = 25
rs = np.random.RandomState(0)
table = jnp.asarray(rs.rand(N, 16), jnp.float32)
idx0 = jnp.asarray(rs.randint(0, N, R), jnp.int32)
idx_steps = jnp.asarray(rs.randint(0, N, (STEPS, R)), jnp.int32)


def dep_fori(idx):
    def body(i, c):
        s, j = c
        rec = table[j]
        j = (j + jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)) & (N - 1)
        return s + rec[:, 0], j
    s, _ = jax.lax.fori_loop(0, STEPS, body, (jnp.zeros((R,)), idx))
    return s.sum()


def indep_scan(idx_steps):
    def body(s, j):
        rec = table[j]
        return s + rec[:, 0], None
    s, _ = jax.lax.scan(body, jnp.zeros((R,)), idx_steps)
    return s.sum()


def dep_unrolled(idx):
    s = jnp.zeros((R,))
    j = idx
    for _ in range(STEPS):
        rec = table[j]
        j = (j + jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)) & (N - 1)
        s = s + rec[:, 0]
    return s.sum()


def dep_unrolled_1d(idx):
    # Same but gathering 4 separate 1-wide columns (narrow gathers).
    t0c = table[:, 0].copy()
    t6c = table[:, 6].copy()
    s = jnp.zeros((R,))
    j = idx
    for _ in range(STEPS):
        a = t0c[j]
        b = t6c[j]
        j = (j + jax.lax.bitcast_convert_type(b, jnp.int32)) & (N - 1)
        s = s + a
    return s.sum()


bench("fori data-dependent gather x25", jax.jit(dep_fori), idx0)
bench("scan data-independent gather x25", jax.jit(indep_scan), idx_steps)
bench("unrolled data-dependent gather x25", jax.jit(dep_unrolled), idx0)
bench("unrolled data-dependent 1-col gathers x25", jax.jit(dep_unrolled_1d), idx0)

# table in smaller width
table8 = table[:, :8].copy()


def dep_unrolled8(idx):
    s = jnp.zeros((R,))
    j = idx
    for _ in range(STEPS):
        rec = table8[j]
        j = (j + jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)) & (N - 1)
        s = s + rec[:, 0]
    return s.sum()


bench("unrolled dep gather width 8 x25", jax.jit(dep_unrolled8), idx0)
