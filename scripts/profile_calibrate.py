"""Calibrate raw TPU capabilities through the axon tunnel: matmul TFLOPs,
elementwise shapes 1D vs 2D, while_loop per-iteration overhead, gather
widths."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:46s} {dt*1000:9.3f} ms")
    return dt


def main():
    print("backend:", jax.devices())

    # MXU: big matmul.
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    dt = bench("matmul 4096^3 bf16", jax.jit(lambda a: (a @ a).sum()), a, n=5)
    print(f"   -> {2*4096**3/dt/1e12:.1f} TFLOP/s")

    a32 = jnp.ones((2048, 2048), jnp.float32)
    dt = bench("matmul 2048^3 f32", jax.jit(lambda a: (a @ a).sum()), a32, n=5)
    print(f"   -> {2*2048**3/dt/1e12:.1f} TFLOP/s")

    # Elementwise: same element count, different shapes.
    R = 1 << 20
    x1 = jnp.ones((R,), jnp.float32)
    x2 = jnp.ones((R // 128, 128), jnp.float32)
    x3 = jnp.ones((8, R // 8), jnp.float32)
    f = lambda x: x * 1.5 + jnp.abs(x) * x - x * x + jnp.minimum(x, 0.5)
    chain = jax.jit(lambda x: f(f(f(f(f(x))))).sum())
    for name, x in [("(1M,)", x1), ("(8192,128)", x2), ("(8,131072)", x3)]:
        dt = bench(f"25-op elementwise {name}", chain, x)
        print(f"   -> {25*R/dt/1e9:.0f} Gop/s")

    # Reduction bandwidth.
    big = jnp.ones((1 << 26,), jnp.float32)  # 256 MB
    dt = bench("sum 256MB", jax.jit(lambda x: x.sum()), big, n=5)
    print(f"   -> {(1<<28)/dt/1e9:.0f} GB/s")

    # while_loop fixed overhead: tiny body, many iterations.
    def wl(n_iter):
        def run(x):
            def body(c):
                i, x = c
                return i + 1, x * 1.000001
            def cond(c):
                return c[0] < n_iter
            return jax.lax.while_loop(cond, body, (0, x))[1].sum()
        return jax.jit(run)

    small = jnp.ones((128,), jnp.float32)
    d100 = bench("while_loop 100 iters tiny body", wl(100), small)
    d1000 = bench("while_loop 1000 iters tiny body", wl(1000), small)
    print(f"   -> per-iteration overhead ~{(d1000-d100)/900*1e6:.0f} us")

    # Gather widths on 1M indices.
    rs = np.random.RandomState(0)
    idx = jnp.asarray(rs.randint(0, 100000, R), jnp.int32)
    for w in (1, 2, 3, 4, 8, 16, 24, 48):
        tab = jnp.asarray(rs.rand(100000, w), jnp.float32)
        bench(f"gather width {w}", jax.jit(lambda t, i: t[i].sum()), tab, idx)

    # fori_loop with 20 gathers per iteration (traversal-like).
    tab = jnp.asarray(rs.rand(100000, 16), jnp.float32)

    def trav_like(idx):
        def body(i, c):
            s, j = c
            rec = tab[j]
            j = (j + jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)) % 100000
            return s + rec[:, 0], j

        s, _ = jax.lax.fori_loop(0, 25, body, (jnp.zeros((R,)), idx))
        return s.sum()

    dt = bench("25-step pointer chase, 1 gather/step", jax.jit(trav_like), idx, n=5)
    print(f"   -> {dt/25*1000:.2f} ms/step")


if __name__ == "__main__":
    main()
