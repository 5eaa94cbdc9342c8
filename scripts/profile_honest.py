"""Honest microbenchmarks: consume results nonlinearly so XLA cannot
algebraically rewrite the op away."""

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
rs = np.random.RandomState(0)

consume = lambda x: jnp.sum(jnp.abs(x - 0.25) * x)

for N in (1024, 8192, 65536):
    tab = jnp.asarray(rs.rand(N, 16), jnp.float32)
    idx = jnp.asarray(rs.randint(0, N, R), jnp.int32)
    idx_s = jnp.sort(idx)
    bench(f"honest gather random  N={N:6d} w16", jax.jit(lambda t, i: consume(t[i])), tab, idx)
    bench(f"honest gather sorted  N={N:6d} w16", jax.jit(lambda t, i: consume(t[i])), tab, idx_s)

# Honest sort with payloads.
keys = jnp.asarray(rs.randint(0, 65536, R), jnp.int32)
pay = [jnp.asarray(rs.rand(R), jnp.float32) for _ in range(12)]


def multisort(k, *p):
    out = jax.lax.sort((k,) + p, num_keys=1)
    return consume(out[3]) + consume(out[7])


bench("honest lax.sort key+12 payloads", jax.jit(multisort), keys, *pay)


def argsort_only(k):
    return consume(jnp.argsort(k).astype(jnp.float32))


bench("honest argsort 1M", jax.jit(argsort_only), keys)

# Honest one-hot matmul gather, chunked over rays.
N = 1024
W = 16
tab = jnp.asarray(rs.rand(N, W), jnp.float32).astype(jnp.bfloat16)
idx = jnp.asarray(rs.randint(0, N, R), jnp.int32)
CH = 1 << 15


def onehot_chunked(i, t):
    total = 0.0
    for c in range(R // CH):
        ic = jax.lax.dynamic_slice(i, (c * CH,), (CH,))
        oh = jax.nn.one_hot(ic, N, dtype=jnp.bfloat16)
        g = (oh @ t).astype(jnp.float32)
        total = total + consume(g)
    return total


bench("honest one-hot bf16 N=1024 (32 chunks)", jax.jit(onehot_chunked), idx, tab, n=3)

# Honest transposed elementwise chain with real data.
x = jnp.asarray(rs.rand(R), jnp.float32)


def chain(x):
    for _ in range(5):
        x = x * 1.5 + jnp.abs(x) * x - x * x + jnp.minimum(x, 0.5)
    return consume(x)


dt = bench("honest 25-op elementwise (1M,)", jax.jit(chain), x)
print(f"   -> {25*R/dt/1e9:.0f} Gop/s")

x2 = x.reshape(-1, 128)


def chain2(x):
    for _ in range(5):
        x = x * 1.5 + jnp.abs(x) * x - x * x + jnp.minimum(x, 0.5)
    return consume(x)


dt = bench("honest 25-op elementwise (8192,128)", jax.jit(chain2), x2)
print(f"   -> {25*R/dt/1e9:.0f} Gop/s")

# Honest 36-tri transposed brute force (from earlier, for reference scale).
big = jnp.asarray(rs.rand(1 << 26), jnp.float32)
dt = bench("honest sum-abs 256MB", jax.jit(lambda x: consume(x)), big)
print(f"   -> {(1 << 28) * 1 / dt / 1e9:.0f} GB/s")
