"""Measure per-op costs inside a Mosaic kernel: lane vs sublane reductions,
MT-sized elementwise chains, broadcasts, scalar VMEM reads.  Slope method."""

import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK, G = 512, 128


def timed_pair(make, *args, n1=1000, n2=100000, label=""):
    f1, f2 = make(n1), make(n2)
    jax.block_until_ready(f1(*args)); jax.block_until_ready(f2(*args))
    t0 = time.perf_counter(); jax.block_until_ready(f1(*args))
    t1 = time.perf_counter(); jax.block_until_ready(f2(*args))
    t2 = time.perf_counter()
    print(f"    [{label}] t({n1})={1e3*(t1-t0):.2f}ms t({n2})={1e3*(t2-t1):.2f}ms")
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def bench_body(name, body, extra_scratch=(), n1=1000, n2=100000):
    def make(n_iter):
        def kernel(x_ref, o_ref, acc_ref, *scr):
            acc_ref[:] = x_ref[:]

            def loop(i, _):
                body(x_ref, acc_ref, *scr, i=i)
                return 0

            jax.lax.fori_loop(0, n_iter, loop, 0)
            o_ref[:] = acc_ref[:]

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((BLK, G), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((BLK, G), jnp.float32)]
                + list(extra_scratch),
            )(x)
        return run

    x = jnp.ones((BLK, G), jnp.float32) * 1.0001
    per = timed_pair(make, x, n1=n1, n2=n2, label=name)
    print(f"{name}: {per * 1e9:.0f} ns/iter")


# 1. lane reduction (BLK,G) -> (BLK,1)
bench_body(
    "lane-min (512,128)->(512,1)",
    lambda x, acc, i: acc.__setitem__(
        (slice(None), slice(0, 1)),
        jnp.min(acc[:, :], axis=1, keepdims=True) + i * 1e-12,
    ),
)

# 2. sublane reduction -> (1,G)
bench_body(
    "sublane-min (512,128)->(1,128)",
    lambda x, acc, i: acc.__setitem__(
        (slice(0, 1), slice(None)),
        jnp.min(acc[:, :], axis=0, keepdims=True) + i * 1e-12,
    ),
)

# 3. MT-sized elementwise chain (~60 ops) with (BLK,1)x(1,G) broadcasts
def mt_chain(x, acc, i):
    a = acc[:, 0:1] + i * 1e-12          # (BLK,1)
    b = x[0:1, :]            # (1,G)
    r = a * b
    for _ in range(28):
        r = r * a + b
    acc[:, :] = r
bench_body("60-op bcast chain (512,1)x(1,128)", mt_chain)

# 4. pure elementwise chain, no broadcast
def ew_chain(x, acc, i):
    r = acc[:, :] + i * 1e-12
    for _ in range(29):
        r = r * 1.0000001 + x[:, :]
    acc[:, :] = r
bench_body("60-op elementwise chain (512,128)", ew_chain)

# 5. full-reduce to (1,1)
bench_body(
    "full-max (512,128)->(1,1)",
    lambda x, acc, i: acc.__setitem__(
        (slice(0, 1), slice(0, 1)),
        jnp.max(acc[:, :], axis=(0, 1), keepdims=True) + i * 1e-12,
    ),
)

# 6. scalar VMEM read + SMEM write compaction (8 groups)
def make6(n_iter):
    def kernel(x_ref, o_ref, flag_ref, lst_ref, cnt_ref):
        flag_ref[:, :] = (x_ref[0:8, 0:1] > 0.5).astype(jnp.int32)

        def loop(i, _):
            cnt_ref[0] = 0
            for g in range(8):
                @pl.when(flag_ref[g, 0] > 0)
                def _(g=g):
                    lst_ref[cnt_ref[0]] = g
                    cnt_ref[0] = cnt_ref[0] + 1
            return 0

        jax.lax.fori_loop(0, n_iter, loop, 0)
        o_ref[:] = jnp.full_like(o_ref, cnt_ref[0].astype(jnp.float32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((BLK, G), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((8, 1), jnp.int32),
                pltpu.SMEM((8,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
            ],
        )(x)
    return run

x = jnp.ones((BLK, G), jnp.float32)
per = timed_pair(make6, x)
print(f"8-flag scalar compaction: {per * 1e9:.0f} ns/iter")

print("backend:", jax.default_backend())
